"""Unit tests for larbin_ray.kernels.urlnorm — hand-derived from the
reference code cited in each kernel docstring (url.cxx)."""

from larbin_ray.kernels.urlnorm import (
    Url,
    file_normalize,
    is_protocol,
    normalize_file,
    parse_url,
    site_hash_code,
)


class TestFileNormalize:
    def test_plain(self):
        assert file_normalize(b"/a/b.html") == b"/a/b.html"

    def test_dot_segment(self):
        assert file_normalize(b"/a/./b") == b"/a/b"

    def test_double_slash(self):
        assert file_normalize(b"//a//b") == b"/a/b"

    def test_dotdot(self):
        assert file_normalize(b"/a/b/../c") == b"/a/c"

    def test_dotdot_chain(self):
        assert file_normalize(b"/a/b/../../c") == b"/c"

    def test_dotdot_above_root(self):
        assert file_normalize(b"/../a") is None

    def test_trailing_dot(self):
        assert file_normalize(b"/a/.") == b"/a/"

    def test_trailing_dotdot(self):
        assert file_normalize(b"/a/b/..") == b"/a/"

    def test_trailing_dotdot_above_root(self):
        assert file_normalize(b"/..") is None

    def test_fragment_stripped(self):
        assert file_normalize(b"/a/b#frag") == b"/a/b"

    def test_percent_decode_graph(self):
        # %41 = 'A' (isgraph) -> decoded
        assert file_normalize(b"/%41bc") == b"/Abc"

    def test_percent_space_kept(self):
        assert file_normalize(b"/a%20b") == b"/a%20b"

    def test_percent_2f_decoded(self):
        # isgraph('/') is true so the reference DOES decode %2f
        # (the keep-branch at url.cxx:162 is unreachable for '/')
        assert file_normalize(b"/a%2fb") == b"/a/b"

    def test_decoded_char_not_reexamined(self):
        # decoded '%25' gives '%' but is skipped: no double decoding
        assert file_normalize(b"/%2541") == b"/%41"

    def test_percent_bad_hex(self):
        assert file_normalize(b"/a%zz") is None
        assert file_normalize(b"/a%4") is None

    def test_percent_control_rejected(self):
        assert file_normalize(b"/a%00b") is None
        assert file_normalize(b"/a%0ab") is None

    def test_percent_highbit_rejected(self):
        # %c3 -> signed char < 0 -> not isgraph, not ' '/'/' -> bad url
        assert file_normalize(b"/a%c3b") is None

    def test_highbit_reescape(self):
        # url::normalize re-escapes raw high-bit bytes (url.cxx:576-591)
        assert normalize_file(b"/caf\xc3\xa9") == b"/caf%c3%a9"


class TestParse:
    def test_absolute(self):
        u = parse_url(b"http://Example.COM/Path/X.html", 5, None)
        assert u.host == b"example.com"
        assert u.port == 80
        assert u.file == b"/Path/X.html"  # path case preserved, host lowered

    def test_no_path_gets_slash(self):
        u = parse_url(b"http://example.com", 5, None)
        assert u.file == b"/"

    def test_port(self):
        u = parse_url(b"http://example.com:8080/x", 5, None)
        assert u.port == 8080

    def test_empty_port_is_zero(self):
        # url.cxx:504-513: ':' with no digits leaves port 0
        u = parse_url(b"http://example.com:/x", 5, None)
        assert u.port == 0

    def test_port_junk_drops_path(self):
        # after port digits stop, a non-'/' char means file = "/"
        u = parse_url(b"http://example.com:80abc", 5, None)
        assert u.port == 80 and u.file == b"/"

    def test_https_dropped(self):
        base = parse_url(b"http://h.example/a/", 5, None)
        u = parse_url(b"https://other.example/x", 4, base)
        assert not u.is_valid()

    def test_mailto_dropped(self):
        base = parse_url(b"http://h.example/a/", 5, None)
        assert not parse_url(b"mailto:x@y.z", 4, base).is_valid()

    def test_scheme_case_sensitive(self):
        # startWith("http://", u) is case-sensitive: HTTP:// is not
        # absolute; with no base it is dropped
        assert not parse_url(b"HTTP://h.example/x", 5, None).is_valid()

    def test_relative_join(self):
        base = parse_url(b"http://h.example/a/b.html", 5, None).give_base()
        u = parse_url(b"c/d.html", 4, base)
        assert u.host == b"h.example" and u.file == b"/a/c/d.html"

    def test_rooted_relative(self):
        base = parse_url(b"http://h.example/a/b.html", 5, None).give_base()
        u = parse_url(b"/x.html", 4, base)
        assert u.file == b"/x.html"

    def test_http_colon_relative(self):
        base = parse_url(b"http://h.example/a/", 5, None)
        u = parse_url(b"http:/x.html", 4, base)
        assert u.host == b"h.example" and u.file == b"/x.html"

    def test_relative_with_dotdot(self):
        base = parse_url(b"http://h.example/a/b/c.html", 5, None).give_base()
        u = parse_url(b"../x.html", 4, base)
        assert u.file == b"/a/x.html"

    def test_no_base_relative_dropped(self):
        assert not parse_url(b"x.html", 5, None).is_valid()

    def test_is_protocol(self):
        assert is_protocol(b"ftp://x")
        assert is_protocol(b"news:comp.lang")
        assert not is_protocol(b"/path:x")
        assert not is_protocol(b"x/y:z")


class TestValidity:
    def test_host_len(self):
        u = Url(b"h" * 256, 80, b"/", 0)
        assert not u.is_valid()
        assert Url(b"h" * 255, 80, b"/", 0).is_valid()

    def test_url_len(self):
        # lh + len(file) + 18 < 1024
        host = b"h.example"
        file = b"/" + b"a" * (1024 - 18 - len(host) - 1)
        assert not Url(host, 80, file, 0).is_valid()
        assert Url(host, 80, file[:-1], 0).is_valid()


class TestHashes:
    def test_hash_code_poly31(self):
        u = Url(b"ab", 80, b"/c", 0)
        # h = 80; h=31*80+97; h=31*h+98; h=31*h+47; h=31*h+99 (mod 2^32) % 64e6
        h = 80
        for ch in b"ab/c":
            h = (31 * h + ch) & 0xFFFFFFFF
        assert u.hash_code() == h % 64_000_000

    def test_host_hash_poly37(self):
        h = 0
        for ch in b"h.example":
            h = (37 * h + ch) & 0xFFFFFFFF
        assert site_hash_code(b"h.example") == h % 20_000

    def test_signed_char_highbit(self):
        # IDN host bytes feed as negative signed chars
        host = b"\xe4\xbe\x8b.example"
        h = 0
        for ch in host:
            h = (37 * h + (ch - 256 if ch >= 0x80 else ch)) & 0xFFFFFFFF
        assert site_hash_code(host) == h % 20_000

    def test_give_url(self):
        assert Url(b"h.example", 80, b"/x", 0).give_url() == b"http://h.example/x"
        assert Url(b"h.example", 8080, b"/x", 0).give_url() == b"http://h.example:8080/x"
