"""Unit tests for larbin_ray.kernels.httpparse (file.cxx:366-594)."""

from larbin_ray.config import CrawlConfig
from larbin_ray.kernels.httpparse import content_dup_code, parse_response

CFG = CrawlConfig()


def resp(status_line: bytes, headers: list[bytes], body: bytes) -> bytes:
    return status_line + b"\r\n" + b"".join(h + b"\r\n" for h in headers) + b"\r\n" + body


class TestParseResponse:
    def test_ok_html(self):
        raw = resp(b"HTTP/1.0 200 OK", [b"Content-Type: text/html"], b"<html>hi</html>")
        r = parse_response(raw, CFG)
        assert r.status == "html"
        assert r.body == b"<html>hi</html>"
        assert raw[r.content_start:] == r.body

    def test_status_char9_only(self):
        # only buffer[9] is inspected (file.cxx:419): "HTTP/1.0 2xx" with
        # garbage code still counts as 2xx
        raw = resp(b"HTTP/1.0 2ZZ oops", [], b"body")
        assert parse_response(raw, CFG).status == "html"

    def test_err40x(self):
        raw = resp(b"HTTP/1.0 404 Not Found", [b"Content-Type: text/html"], b"nope")
        assert parse_response(raw, CFG).status == "err40X"

    def test_5xx_is_err40x(self):
        raw = resp(b"HTTP/1.0 500 Oops", [], b"")
        assert parse_response(raw, CFG).status == "err40X"

    def test_early_stop_short_line(self):
        assert parse_response(b"HTTP 200\n", CFG).status == "earlyStop"

    def test_early_stop_no_newline(self):
        assert parse_response(b"HTTP/1.0 200 OK", CFG).status == "earlyStop"

    def test_early_stop_unterminated_headers(self):
        raw = b"HTTP/1.0 200 OK\r\nContent-Type: text/html\r\n"  # no blank line
        assert parse_response(raw, CFG).status == "earlyStop"

    def test_bad_type(self):
        raw = resp(b"HTTP/1.0 200 OK", [b"Content-Type: application/pdf"], b"x")
        assert parse_response(raw, CFG).status == "badType"

    def test_any_type_allows(self):
        cfg = CrawlConfig(any_type=True)
        raw = resp(b"HTTP/1.0 200 OK", [b"Content-Type: application/pdf"], b"x")
        assert parse_response(raw, cfg).status == "html"

    def test_get_image_allows_images(self):
        cfg = CrawlConfig(get_image=True)
        raw = resp(b"HTTP/1.0 200 OK", [b"Content-Type: image/png"], b"x")
        assert parse_response(raw, cfg).status == "html"
        raw2 = resp(b"HTTP/1.0 200 OK", [b"Content-Type: application/pdf"], b"x")
        assert parse_response(raw2, cfg).status == "badType"

    def test_too_big(self):
        raw = resp(b"HTTP/1.0 200 OK", [b"Content-Length: 9000000"], b"x")
        assert parse_response(raw, CFG).status == "tooBig"
        ok = resp(b"HTTP/1.0 200 OK", [b"Content-Length: 8388608"], b"x")
        assert parse_response(ok, CFG).status == "html"

    def test_redirect_location(self):
        raw = resp(b"HTTP/1.0 301 Moved", [b"Location: http://h.example/new"], b"")
        r = parse_response(raw, CFG)
        assert r.status == "err30X"
        assert r.location == b"http://h.example/new"

    def test_redirect_no_location(self):
        raw = resp(b"HTTP/1.0 302 Found", [b"Server: x"], b"")
        assert parse_response(raw, CFG).status == "err40X"

    def test_redirect_cgi_location_dropped(self):
        # Location stopped by '?' (notCgiChar) -> err30X with no url
        raw = resp(b"HTTP/1.0 301 Moved", [b"Location: http://h.example/a?b=1"], b"")
        r = parse_response(raw, CFG)
        assert r.status == "err30X" and r.location is None

    def test_redirect_cgi_ok_when_getcgi(self):
        cfg = CrawlConfig(get_cgi=True)
        raw = resp(b"HTTP/1.0 301 Moved", [b"Location: http://h.example/a?b=1"], b"")
        r = parse_response(raw, cfg)
        assert r.location == b"http://h.example/a?b=1"

    def test_case_insensitive_headers(self):
        raw = resp(b"HTTP/1.0 200 OK", [b"CONTENT-TYPE: TEXT/HTML"], b"ok")
        assert parse_response(raw, CFG).status == "html"


class TestContentDup:
    def test_range_exclusive(self):
        # only 'A' < c < 'z' feeds the hash: 'A' and 'z' themselves don't
        assert content_dup_code(b"A z") == 0
        assert content_dup_code(b"B") == ord("B")

    def test_poly23(self):
        code = 0
        for c in b"Hello":
            if 0x41 < c < 0x7A:
                code = (code * 23 + c) % 64_000_000
        assert content_dup_code(b"Hello") == code

    def test_ignores_nonletters_and_highbit(self):
        assert content_dup_code(b"B<>1 2\xff\x80") == content_dup_code(b"B")

    def test_stops_at_nul(self):
        assert content_dup_code(b"Bc\x00de") == content_dup_code(b"Bc")


class TestCookies:
    def test_add_cookie_requires_semicolon(self):
        from larbin_ray.kernels.httpparse import add_cookie

        # url.cxx:618: no ';' in the value -> no capture
        assert add_cookie(None, b"Set-Cookie: a=1") is None
        assert add_cookie(None, b"Set-Cookie: a=1; Path=/") == b"a=1"

    def test_add_cookie_appends_with_separator(self):
        from larbin_ray.kernels.httpparse import add_cookie

        c = add_cookie(b"a=1", b"Set-Cookie: b=2; HttpOnly")
        assert c == b"a=1; b=2"

    def test_add_cookie_cap_127(self):
        from larbin_ray.kernels.httpparse import add_cookie

        big = b"Set-Cookie: " + b"x" * 200 + b"; Path=/"
        assert len(add_cookie(None, big)) == 127

    def test_parse_response_captures_in_order(self):
        from larbin_ray.config import CrawlConfig
        from larbin_ray.kernels.httpparse import parse_response

        raw = (b"HTTP/1.0 200 OK\r\nSet-Cookie: s=1; P\r\n"
               b"Content-Type: text/html\r\nSet-Cookie: t=2; Q\r\n\r\nbody")
        r = parse_response(raw, CrawlConfig(use_cookies=True))
        assert r.cookie == b"s=1; t=2"
        r2 = parse_response(raw, CrawlConfig(use_cookies=False))
        assert r2.cookie is None
