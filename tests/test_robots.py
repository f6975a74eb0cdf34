"""Unit tests for larbin_ray.kernels.robots (file.cxx:95-250,
text.cxx:52-73)."""

from larbin_ray.kernels.robots import (
    parse_robots_body,
    parse_robots_response,
)
from larbin_ray.kernels.robots import test_robots as robots_allowed
from larbin_ray.kernels.textutil import robots_match

UA = b"larbin_2.6.5"


def rob(body: bytes, status: bytes = b"HTTP/1.0 200 OK") -> bytes:
    return status + b"\r\nContent-Type: text/plain\r\n\r\n" + body


class TestParse:
    def test_star_record(self):
        got = parse_robots_response(rob(b"User-agent: *\nDisallow: /private/\n"), UA)
        assert got == [b"/private/"]

    def test_strong_overrides_weak(self):
        body = (b"User-agent: *\nDisallow: /all/\n"
                b"User-agent: larbin\nDisallow: /forlarbin/\n"
                b"User-agent: other\nDisallow: /other/\n")
        # "larbin" is contained in our agent name -> strong record wins and
        # parsing stops at the record after it
        assert parse_robots_response(rob(body), UA) == [b"/forlarbin/"]

    def test_unrelated_record_ignored(self):
        body = b"User-agent: googlebot\nDisallow: /goo/\nUser-agent: *\nDisallow: /x/\n"
        assert parse_robots_response(rob(body), UA) == [b"/x/"]

    def test_weak_replaces_weak(self):
        # quirk file.cxx:204-209: a later matched record *replaces* the
        # earlier one (no union)
        body = b"User-agent: *\nDisallow: /a/\nUser-agent: *\nDisallow: /b/\n"
        assert parse_robots_response(rob(body), UA) == [b"/b/"]

    def test_initial_state_weak(self):
        # disallows before any User-agent line apply (state starts at 1)
        assert parse_robots_response(rob(b"Disallow: /early/\n"), UA) == [b"/early/"]

    def test_star_value_becomes_slash(self):
        assert parse_robots_response(rob(b"User-agent: *\nDisallow: *\n"), UA) == [b"/"]

    def test_missing_leading_slash_prepended(self):
        assert parse_robots_response(rob(b"User-agent: *\nDisallow: tmp/\n"), UA) == [b"/tmp/"]

    def test_non_2xx_no_restrictions(self):
        raw = rob(b"User-agent: *\nDisallow: /\n", status=b"HTTP/1.0 404 NF")
        assert parse_robots_response(raw, UA) == []

    def test_values_normalized(self):
        assert parse_robots_response(rob(b"User-agent: *\nDisallow: /a//b/./c\n"), UA) == [b"/a/b/c"]

    def test_comments_skipped(self):
        body = b"# top comment\nUser-agent: * # inline\nDisallow: /x/ # c\n"
        assert parse_robots_response(rob(body), UA) == [b"/x/"]

    def test_item_cap(self):
        body = b"User-agent: *\n" + b"".join(
            b"Disallow: /d%d/\n" % i for i in range(300))
        got = parse_robots_response(rob(body), UA)
        assert len(got) == 256 and got[0] == b"/d0/" and got[-1] == b"/d255/"

    def test_multiple_values_one_disallow(self):
        # nextToken splits on whitespace too: several paths on one line
        assert parse_robots_body(b"Disallow: /a/ /b/\n", 0, UA) == [b"/a/", b"/b/"]


class TestMatch:
    def test_prefix(self):
        assert robots_match(b"/private/", b"/private/x.html")
        assert not robots_match(b"/private/", b"/pub/x.html")

    def test_star_skips(self):
        assert robots_match(b"/a/*.html", b"/a/x/y.html")
        assert not robots_match(b"/a/*.html", b"/a/x/y.txt")

    def test_trailing_star(self):
        assert robots_match(b"/a*", b"/a/anything")
        assert robots_match(b"/a*", b"/a")

    def test_star_strchr_semantics(self):
        # '*x' jumps to the FIRST 'x' and continues there
        assert robots_match(b"/*x/end", b"/abcx/end")
        assert not robots_match(b"/*x/end", b"/abcx/mid/end")

    def test_slash_matches_all(self):
        assert robots_match(b"/", b"/anything")

    def test_test_robots(self):
        forb = [b"/private/", b"/tmp/"]
        assert not robots_allowed(b"/private/a.html", forb)
        assert robots_allowed(b"/pub/a.html", forb)
        assert robots_allowed(b"/private/a.html", forb, ignore_robots=True)
