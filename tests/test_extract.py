"""Unit tests for larbin_ray.kernels.extract (file.cxx:597-798) and the
admission chain (manageUrl/filter1)."""

from larbin_ray.config import CrawlConfig
from larbin_ray.kernels.extract import extract_links, filter1, parse_html
from larbin_ray.kernels.urlnorm import parse_url

CFG = CrawlConfig()
HERE = parse_url(b"http://h.example/dir/page.html", 5, None)


def links(body: bytes, cfg: CrawlConfig = CFG):
    return [v for a, v in parse_html(body, cfg.get_image, cfg.get_cgi) if a == 0]


class TestParseHtml:
    def test_a_href(self):
        assert links(b'<a href="http://x.example/p.html">t</a>') == [b"http://x.example/p.html"]

    def test_link_frame(self):
        body = b'<link href="/style.html"><frame src="/f.html">'
        assert links(body) == [b"/style.html", b"/f.html"]

    def test_img_only_with_getimage(self):
        body = b'<img src="/pic.html">'
        assert links(body) == []
        assert links(body, CrawlConfig(get_image=True)) == [b"/pic.html"]

    def test_any_a_tag_prefix(self):
        # any tag starting with 'a' is scanned for href (file.cxx:677-683)
        assert links(b'<abbr href="/x.html">') == [b"/x.html"]

    def test_comment_skipped(self):
        body = b'<!-- <a href="/hidden.html"> --><a href="/seen.html">'
        assert links(body) == [b"/seen.html"]

    def test_unterminated_comment_ends_parse(self):
        body = b'<!-- <a href="/hidden.html"> <a href="/also.html">'
        assert links(body) == []

    def test_case_insensitive_tags(self):
        assert links(b'<A HREF="/x.html">') == [b"/x.html"]
        assert links(b'<LiNk HrEf="/y.html">') == [b"/y.html"]

    def test_unquoted_value(self):
        assert links(b"<a href=/plain.html>") == [b"/plain.html"]

    def test_single_quotes(self):
        assert links(b"<a href='/sq.html'>") == [b"/sq.html"]

    def test_backslash_to_slash(self):
        assert links(b'<a href="\\dos\\path.html">') == [b"/dos/path.html"]

    def test_cgi_value_dropped(self):
        assert links(b'<a href="/a.html?q=1"><a href="/b.html">') == [b"/b.html"]

    def test_cgi_kept_with_getcgi(self):
        got = links(b'<a href="/a.html?q=1">', CrawlConfig(get_cgi=True))
        assert got == [b"/a.html?q=1"]

    def test_value_at_eof_dropped(self):
        # unterminated value runs to end of buffer: dropped, parse ends
        assert links(b'<a href="/x.html"><a href="/trunc') == [b"/x.html"]

    def test_short_value_before_gt_quirk(self):
        # the posParse[i] lookahead (file.cxx:712): href value "x" with
        # closing '">' 4 bytes after the value start is dropped
        assert links(b'<a href="x">') == []
        assert links(b'<a href="longer.html">') == [b"longer.html"]

    def test_over_1024_dropped(self):
        long = b"/" + b"a" * 1100 + b".html"
        assert links(b'<a href="' + long + b'">ok</a><a href="/ok.html">') == [b"/ok.html"]

    def test_nul_stops_scan(self):
        assert links(b'<a href="/a.html">\x00<a href="/b.html">') == [b"/a.html"]

    def test_attrs_before_href(self):
        assert links(b'<a class="c" id="i" href="/x.html">') == [b"/x.html"]

    def test_base_event(self):
        evs = parse_html(b'<base href="http://b.example/dir/">', False, False)
        assert evs == [(1, b"http://b.example/dir/")]


class TestExtractLinks:
    def test_relative_resolved_against_page_dir(self):
        r = extract_links(HERE, b'<a href="sub/x.html">', CFG)
        assert [c.url.give_url() for c in r.candidates] == [b"http://h.example/dir/sub/x.html"]
        assert r.candidates[0].url.depth == 4

    def test_base_override(self):
        body = b'<base href="http://b.example/bd/"><a href="rel.html">'
        r = extract_links(HERE, body, CFG)
        assert [c.url.give_url() for c in r.candidates] == [b"http://b.example/bd/rel.html"]

    def test_invalid_base_drops_relatives(self):
        # a base whose rewritten url is invalid sets base=None: relative
        # links are dropped, absolute ones still work
        body = (b'<base href="http://' + b"h" * 300 + b'/dir/">'
                b'<a href="rel.html"><a href="http://abs.example/x.html">')
        r = extract_links(HERE, body, CFG)
        assert [c.url.give_url() for c in r.candidates] == [b"http://abs.example/x.html"]

    def test_base_without_late_slash_ignored(self):
        # no '/' after position 7: base unchanged (file.cxx:772-774)
        body = b'<base href="nothing"><a href="rel.html">'
        r = extract_links(HERE, body, CFG)
        assert [c.url.give_url() for c in r.candidates] == [b"http://h.example/dir/rel.html"]

    def test_external_links_policy(self):
        cfg = CrawlConfig(external_links=False)
        body = b'<a href="http://other.example/x.html"><a href="/same.html">'
        r = extract_links(HERE, body, cfg)
        assert [c.url.give_url() for c in r.candidates] == [b"http://h.example/same.html"]

    def test_lock_site_outsite_error(self):
        cfg = CrawlConfig(lock_site=True)
        r = extract_links(HERE, b'<a href="http://other.example/x.html">', cfg)
        assert r.candidates == [] and r.errors == ["outSite"]

    def test_depth_by_site_reset(self):
        cfg = CrawlConfig(depth_by_site=True, depth_in_site=5)
        r = extract_links(HERE, b'<a href="http://other.example/x.html">', cfg)
        assert r.candidates[0].url.depth == 5

    def test_too_deep(self):
        here0 = parse_url(b"http://h.example/p.html", 0, None)
        r = extract_links(here0, b'<a href="/x.html">', CFG)
        assert r.candidates == [] and r.errors == ["tooDeep"]

    def test_forbidden_extension_silent(self):
        r = extract_links(HERE, b'<a href="/file.zip"><a href="/ok.html">', CFG)
        assert [c.url.file for c in r.candidates] == [b"/ok.html"]
        assert r.errors == []

    def test_trailing_slash_allowed(self):
        r = extract_links(HERE, b'<a href="/dir/">', CFG)
        assert [c.url.file for c in r.candidates] == [b"/dir/"]


class TestFilter1:
    def test_html_suffix_no_dot(self):
        # "html"/"htm" suffix match has no dot: "/xhtml" passes as html
        assert filter1(b"h.example", b"/xhtml", CFG)
        assert filter1(b"h.example", b"/x.htm", CFG)

    def test_forbidden(self):
        assert not filter1(b"h.example", b"/x.zip", CFG)
        assert not filter1(b"h.example", b"/x.ZIP", CFG)  # case-insensitive

    def test_other_ext_allowed(self):
        assert filter1(b"h.example", b"/x.php", CFG)

    def test_domain_limit(self):
        cfg = CrawlConfig(limit_to_domains=(".example",))
        assert filter1(b"h.example", b"/x.html", cfg)
        assert not filter1(b"h.other", b"/x.html", cfg)
