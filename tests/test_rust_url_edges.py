"""rust-url edge-semantics fixtures (round-2, VERDICT item 10 / ROADMAP).

The reference resolves links with rust-url's WHATWG parser
(src/markdown_converter.rs:295-301 via url::Url::join + to_string).
Expected values below are rust-url's documented WHATWG outcomes:
backslash-as-slash in special schemes, path/query/fragment
percent-encode sets, UTF-8 percent-encoding of non-ASCII, IDNA hosts,
default-port stripping, dot-segment resolution.
"""

import pytest

from markdown_lab_spark.oracle.url_utils import url_join

B = "https://example.com/dir/page"

CASES = [
    # backslash-as-slash (special schemes)
    (B, "\\foo", "https://example.com/foo"),
    (B, "a\\b", "https://example.com/dir/a/b"),
    (B, "\\\\other.com\\p", "https://other.com/p"),
    # backslash NOT a separator in query/fragment
    (B, "x?a\\b", "https://example.com/dir/x?a\\b"),
    (B, "x#a\\b", "https://example.com/dir/x#a\\b"),
    # path percent-encode set: space " < > ` { }
    (B, "a b", "https://example.com/dir/a%20b"),
    (B, "a<b>c", "https://example.com/dir/a%3Cb%3Ec"),
    (B, "{x}", "https://example.com/dir/%7Bx%7D"),
    (B, "a`b", "https://example.com/dir/a%60b"),
    # existing escapes pass through untouched, stray % kept verbatim
    (B, "a%20b", "https://example.com/dir/a%20b"),
    (B, "100%", "https://example.com/dir/100%"),
    # non-ASCII path -> UTF-8 percent-encoded
    (B, "héllo", "https://example.com/dir/h%C3%A9llo"),
    (B, "日本", "https://example.com/dir/%E6%97%A5%E6%9C%AC"),
    # query/fragment encode sets
    (B, "x?a b", "https://example.com/dir/x?a%20b"),
    (B, 'x?a"b', "https://example.com/dir/x?a%22b"),
    (B, "x#a b", "https://example.com/dir/x#a%20b"),
    # IDNA host
    ("https://e.com/", "https://münich.example/x",
     "https://xn--mnich-kva.example/x"),
    ("https://bücher.example/a/", "b",
     "https://xn--bcher-kva.example/a/b"),
    # UTS-46 deviation characters (non-transitional, like rust-url):
    # ß is KEPT and punycoded, not folded to ss as IDNA2003 would
    ("https://e.com/", "https://faß.de/x", "https://xn--fa-hia.de/x"),
    # Greek final sigma likewise kept
    ("https://e.com/", "https://βόλοσς.example/",
     "https://xn--nxasmme5c.example/"),
    # a joiner in an invalid context is an IDNA error -> rust-url Err
    # path -> link dropped
    ("https://e.com/", "https://a‌b.example/x", None),
    # uppercase non-ASCII is case-mapped by the UTS-46 table first
    ("https://e.com/", "https://MÜNICH.example/x",
     "https://xn--mnich-kva.example/x"),
    # default port stripped, scheme/host lowercased, empty path -> "/"
    (B, "HTTPS://EXAMPLE.COM:443", "https://example.com/"),
    (B, "http://Other.Example:80/P", "http://other.example/P"),
    (B, "http://other.example:8080/", "http://other.example:8080/"),
    # dot segments
    (B, "../up", "https://example.com/up"),
    (B, "./same", "https://example.com/dir/same"),
    (B, "..\\up", "https://example.com/up"),  # backslash + dot segment
    # protocol-relative
    (B, "//cdn.example/x", "https://cdn.example/x"),
    # non-special scheme passes through without special serialization
    (B, "mailto:a@b.c", "mailto:a@b.c"),
    # VerifyDnsLength=false (rust-url): a label whose punycode exceeds the
    # 63-byte DNS bound is still encoded, not rejected — the idna package's
    # length check is bypassed label-wise (url_utils._idna_host)
    ("https://e.com/", "https://" + "\u00fc" * 40 + ".example/a",
     "https://xn--tdaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa.example/a"),
]


@pytest.mark.parametrize("base,href,want", CASES, ids=[c[1][:24] for c in CASES])
def test_url_join_rust_url_edges(base, href, want):
    assert url_join(base, href) == want
