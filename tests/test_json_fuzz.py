"""M2 serializer fuzz (ROADMAP): pin the serde_json-pretty formatting
contract over adversarial Documents.

serde_json::to_string_pretty (src/markdown_converter.rs:391-395) emits
2-space indent, struct-order keys, raw UTF-8 (non-ASCII unescaped),
shorthand escapes for \\b \\t \\n \\f \\r, \\uXXXX lowercase-hex for
other C0 controls, and no trailing whitespace. json.dumps(indent=2,
ensure_ascii=False) matches on every shape; this fuzz keeps that true
as the oracle evolves.
"""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from markdown_lab_spark.oracle.markdown_converter import (
    CodeBlock,
    Document,
    Heading,
    Image,
    Link,
    ListBlock,
    document_to_json,
    document_to_xml,
)

nasty = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("L", "N", "P", "S", "Z", "Cc")
    ),
    max_size=40,
)


@st.composite
def documents(draw):
    return Document(
        title=draw(nasty),
        base_url="https://example.com/x",
        headings=[
            Heading(level=draw(st.integers(1, 6)), text=draw(nasty))
            for _ in range(draw(st.integers(0, 3)))
        ],
        paragraphs=draw(st.lists(nasty, max_size=4)),
        links=[
            Link(text=draw(nasty), url=draw(nasty))
            for _ in range(draw(st.integers(0, 3)))
        ],
        images=[Image(alt=draw(nasty), src=draw(nasty))],
        lists=[
            ListBlock(
                ordered=draw(st.booleans()),
                items=draw(st.lists(nasty, max_size=3)),
            )
        ],
        code_blocks=[CodeBlock(language=draw(nasty), code=draw(nasty))],
        blockquotes=draw(st.lists(nasty, max_size=3)),
    )


@given(documents())
@settings(max_examples=150, deadline=None)
def test_json_pretty_contract(doc):
    out = document_to_json(doc)
    parsed = json.loads(out)  # roundtrip: valid JSON
    assert parsed["title"] == doc.title
    assert parsed["paragraphs"] == list(doc.paragraphs)
    assert [l["url"] for l in parsed["links"]] == [l.url for l in doc.links]
    # struct field order (serde derives it from the Document struct).
    # Split on "\n" ONLY: serde_json separates lines with LF, and leaves
    # NEL (U+0085) / LS (U+2028) / PS (U+2029) raw inside string values
    # (it escapes only C0 controls, quote, backslash) — str.splitlines()
    # would treat those in-string characters as line breaks and produce
    # pseudo-lines that spuriously fail the indent/whitespace checks.
    keys = [line.split('"')[1] for line in out.split("\n")
            if line.startswith('  "')]
    assert keys == ["title", "base_url", "headings", "paragraphs", "links",
                    "images", "lists", "code_blocks", "blockquotes"]
    # 2-space indent steps, no trailing whitespace on any line
    for line in out.split("\n"):
        assert line == line.rstrip()
        indent = len(line) - len(line.lstrip(" "))
        assert indent % 2 == 0
    # raw UTF-8: non-ASCII never \u-escaped; C0 controls always escaped
    assert "\\u00e9" not in out.lower()
    for ch in out:
        assert ord(ch) >= 0x20 or ch == "\n"


def test_json_unicode_linebreaks_pass_through_raw():
    """Pin serde_json's treatment of NEL/LS/PS: they are NOT C0 controls,
    so serde leaves them raw inside string values (only \\b \\t \\n \\f \\r
    get shorthand escapes and other chars < 0x20 get \\uXXXX)."""
    doc = Document(
        title="ab c d",
        base_url="https://example.com/x",
        headings=[], paragraphs=["xy"], links=[], images=[],
        lists=[], code_blocks=[CodeBlock(language="", code="pq")],
        blockquotes=[],
    )
    out = document_to_json(doc)
    assert "ab c d" in out      # raw, unescaped
    assert "\\u0085" not in out and "\\u2028" not in out
    parsed = json.loads(out)
    assert parsed["title"] == "ab c d"
    assert parsed["code_blocks"][0]["code"] == "pq"


@given(documents())
@settings(max_examples=80, deadline=None)
def test_xml_escaping_wellformed(doc):
    import xml.etree.ElementTree as ET

    out = document_to_xml(doc)
    # parseable iff & < > were escaped everywhere (quick_xml contract),
    # unless a control char (invalid in XML 1.0, both serializers emit
    # them raw) is present
    if any(ord(c) < 0x20 and c not in "\t\n\r" for c in out):
        return
    ET.fromstring(out)
