"""htmltok must be call-for-call identical to the stdlib parser.

parse_document (fast tokenizer) vs parse_document_stdlib (html.parser
feed/close) must build byte-identical trees — on the reference's own
fixtures, the tree-construction adversarial cases, and hypothesis fuzz
over HTML-ish soup including every token class the tokenizer dispatches
(tags, attrs with quotes/entities, comments, bogus comments, doctype,
PIs, marked sections, CDATA script/style, broken tags, lone <, & runs).
"""

import glob

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from markdown_lab_spark.oracle.htmldom import (
    parse_document,
    parse_document_stdlib,
)


def _both(html):
    """(fast_tree_html, stdlib_tree_html) — exceptions normalized."""
    try:
        fast = parse_document(html).html()
    except Exception as exc:
        fast = f"RAISED:{type(exc).__name__}"
    try:
        std = parse_document_stdlib(html).html()
    except Exception as exc:
        std = f"RAISED:{type(exc).__name__}"
    return fast, std


FIXTURES = sorted(glob.glob("/root/reference/test_data/*.html"))


@pytest.mark.parametrize("path", FIXTURES)
def test_reference_fixtures(path):
    html = open(path, encoding="utf-8", errors="replace").read()
    fast, std = _both(html)
    assert fast == std


HAND_CASES = [
    "",
    "plain text only",
    "text &amp; entities &lt;kept&gt; &unknown; &#65; &#x41; &notsemi",
    "<p>para</p><p>two",
    '<a href="x&amp;y" title=\'q\'>t</a>',
    "<a href=unquoted other>x</a>",
    "<br/><div/>text</div>",
    "<!-- comment --><p>x</p>",
    "<!-- unterminated comment",
    "<!bogus decl><p>x</p>",
    "<!DOCTYPE html><p>x</p>",
    "<![CDATA[raw <b> stuff]]><p>x</p>",
    "<![if !IE]>ms<![endif]><p>x</p>",
    "<?php echo 1; ?><p>x</p>",
    "<?pi-unterminated",
    "<script>var a = '<b>not a tag</b>';</script><p>after</p>",
    "<script>unterminated cdata",
    "<style>p { color: red; } /* < > & */</style>",
    "<SCRIPT>UPPER</SCRIPT>x",
    "<script>x</ script ><p>y</p>",
    "a < b text with lone angle",
    "trailing lone <",
    "<",
    "</>",
    "</ >x",
    "</tag attr=v>x",
    "<tag attr=>y</tag>",
    "<tag 'weird>z",
    "<p unterminated attr='",
    "<p a=\"1\" a='2' A=3>dup attrs</p>",
    "<täg>unicode tagish</täg>",
    "<p>&#1114112; overflow charref</p>",
    "<p>&#xZZ; bad hex</p>",
    "text & more & even&",
    "<div><span>deep</span></div> tail",
    "<p>one<table><tr>r<td>c</td></tr>loose</table>two</p>",
]


@pytest.mark.parametrize("html", HAND_CASES, ids=[h[:24] for h in HAND_CASES])
def test_hand_cases(html):
    fast, std = _both(html)
    assert fast == std


soup = st.lists(
    st.sampled_from(
        list("abc <>/=\"'&;!?#-[]x0\n\té日") + ["<p", "</p>", "<!--", "-->",
         "<script>", "</script>", "&amp;", "&#65;", "<![CDATA[", "]]>",
         "<!DOCTYPE", "<?", "/>", " href=", "='v'",
         # shapes straddling the round-3 fast paths: quoted attrs with and
         # without '&', spaces around '=', self-closing with attrs
         ' a="v"', ' b = "w"', ' c="x&y"', '<a href="u">', "</i>", "< /p>",
         '"/>', "<B>"]
    ),
    max_size=40,
).map("".join)


@given(soup)
@settings(max_examples=400, deadline=None)
def test_fuzz_differential(html):
    fast, std = _both(html)
    assert fast == std
