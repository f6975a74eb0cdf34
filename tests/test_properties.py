"""Property-based tests (hypothesis): differential equivalence of the
vectorized state kernels vs their sequential reference forms, and
normalization invariants."""

import numpy as np
from hypothesis import example, given, settings
from hypothesis import strategies as st

from larbin_ray.kernels.httpparse import content_dup_code
from larbin_ray.kernels.textutil import robots_match
from larbin_ray.kernels.urlnorm import Url, file_normalize, parse_url
from larbin_ray.state.bitset import Bitset

# paths built from url-ish bytes (printable ASCII incl. the special chars)
_pathish = st.binary(min_size=0, max_size=60).map(
    lambda b: b"/" + bytes(x % 0x5E + 0x21 for x in b))


@given(_pathish.filter(lambda p: b"%" not in p))
@settings(max_examples=300, deadline=None)
@example(path=b"/.#")
@example(path=b"/a/..#f")
def test_normalize_removes_dot_segments(path):
    """For %-free inputs, a successful normalize leaves no //, /./, /../
    and is idempotent — EXCEPT the reference's fragment-cut quirk
    (url.cxx:123-141): the trailing "/." / "/.." collapse tests look for
    end-of-string, so a '#' right after the dot segment freezes it in
    the output (b"/.#" -> b"/.").  Byte-exactness keeps the quirk; such
    an output is not a normalize fixed point."""
    out = file_normalize(path)
    if out is None:
        return
    body = out.split(b"#")[0]
    assert b"//" not in body
    assert b"/./" not in body
    assert b"/../" not in body
    if body.endswith((b"/.", b"/..")):
        # only the fragment cut can produce these survivors
        assert b"#" in path
    else:
        assert file_normalize(out) == out


@given(st.from_regex(rb"\A[a-z0-9.\-]{1,20}\Z"),
       st.integers(1, 65535),
       _pathish.filter(lambda p: b"%" not in p and b"#" not in p))
@settings(max_examples=300, deadline=None)
def test_give_url_parse_roundtrip(host, port, path):
    """give_url -> parse_url preserves identity for already-normalized
    %-free urls (what the frontier stores)."""
    norm = file_normalize(path)
    if norm is None or not norm.startswith(b"/"):
        return
    u = Url(host, port, norm, 3)
    if not u.is_valid():
        return
    r = parse_url(u.give_url(), 3, None)
    assert (r.host, r.port, r.file) == (host, port, norm)
    assert r.hash_code() == u.hash_code()


@given(st.lists(st.integers(0, 63_999_999), min_size=0, max_size=200))
@settings(max_examples=200, deadline=None)
def test_bitset_batch_equals_sequential(codes):
    a, b = Bitset(), Bitset()
    batch = a.test_set_many(np.asarray(codes, dtype=np.int64)) \
        if codes else np.empty(0, bool)
    seq = np.asarray([b.test_set(c) for c in codes], dtype=bool)
    assert np.array_equal(np.asarray(batch, dtype=bool), seq)
    assert np.array_equal(a.table, b.table)
    assert np.array_equal(a.set_indices(), np.unique(codes))


@given(st.binary(min_size=0, max_size=2000))
@settings(max_examples=200, deadline=None)
def test_content_dup_vectorized_equals_scalar(body):
    size = 64_000_000
    nul = body.find(b"\0")
    trunc = body if nul == -1 else body[:nul]
    code = 0
    for c in trunc:
        if 0x41 < c < 0x7A:
            code = (code * 23 + c) % size
    assert content_dup_code(body) == code


@given(st.from_regex(rb"\A/[a-z*./]{0,20}\Z"),
       st.from_regex(rb"\A/[a-z./]{0,30}\Z"))
@settings(max_examples=300, deadline=None)
def test_robots_match_prefix_consistency(pattern, path):
    """A starless pattern matches iff it is a byte prefix of the path."""
    if b"*" not in pattern:
        assert robots_match(pattern, path) == path.startswith(pattern)


_HTML_ALPHABET = b'<>!-= "\'\\?*aAbBlLfFiImMgGhrefsrcnk\x00\n\r\t/x.%'
_htmlish = st.lists(
    st.sampled_from(_HTML_ALPHABET), min_size=0, max_size=200).map(bytes)


@given(_htmlish, st.booleans(), st.booleans())
@settings(max_examples=500, deadline=None)
def test_parse_html_fast_equals_spec(body, get_image, get_cgi):
    """The regex-accelerated parse_html is byte-identical to the
    per-byte reference port on arbitrary tag soup (incl. NULs,
    comments, truncated values, quote/CGI stops)."""
    from larbin_ray.kernels.extract import parse_html, parse_html_ref
    assert parse_html(body, get_image, get_cgi) == \
        parse_html_ref(body, get_image, get_cgi)


# Structured constructs: random tag soup almost never assembles a full
# "<a href=..." by chance, so the fused whole-construct fast path needs
# its own generator — well-formed-ish anchors with randomized spacing,
# quoting, tag/param spelling, values (incl. backslashes, CGI chars,
# quotes, EOF truncation) and junk between constructs.
_spc = st.sampled_from([b"", b" ", b"  ", b"\n", b"\t", b"\r\n"])
_tag = st.sampled_from([b"a", b"A", b"link", b"LiNk", b"abbr", b"al",
                        b"base", b"frame", b"img"])
_par = st.sampled_from([b"href", b"HREF", b"hReF", b"src", b"rel",
                        b"hrefx"])
_eq = st.sampled_from([b"=", b"= ", b"==", b" =", b"", b"x"])
_quote = st.sampled_from([b"", b'"', b"'"])
_val = st.lists(st.sampled_from(b'ax/.\\?=*%" \'>\n'),
                min_size=0, max_size=12).map(bytes)
_close = st.sampled_from([b">", b'">', b"'>", b" >", b"", b"/>"])
_construct = st.tuples(_spc, _tag, _spc, _par, _eq, _quote, _val,
                       _close).map(
    lambda t: b"<" + t[0] + t[1] + t[2] + t[3] + t[4] + t[5] + t[6] + t[7])
_junk = st.lists(st.sampled_from(b"x <>!-h"), min_size=0,
                 max_size=6).map(bytes)
_page = st.lists(st.tuples(_construct, _junk), min_size=1,
                 max_size=6).map(lambda ps: b"".join(c + j for c, j in ps))


@given(_page, st.booleans(), st.booleans())
@settings(max_examples=2000, deadline=None)
def test_parse_html_fused_constructs_equal_spec(body, get_image, get_cgi):
    """Fused-path-shaped anchors (and near-misses) agree with the spec."""
    from larbin_ray.kernels.extract import parse_html, parse_html_ref
    assert parse_html(body, get_image, get_cgi) == \
        parse_html_ref(body, get_image, get_cgi)


@given(_pathish)
@settings(max_examples=400, deadline=None)
def test_file_normalize_fast_path_consistent(path):
    """The _RX_FN_SPECIAL fast path returns the input unchanged exactly
    when the full loop would."""
    out = file_normalize(path)
    from larbin_ray.kernels.urlnorm import _RX_FN_SPECIAL
    if _RX_FN_SPECIAL.search(path) is None:
        assert out == path
