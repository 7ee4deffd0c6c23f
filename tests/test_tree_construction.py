"""Tree-construction hardening fixtures (round-2, VERDICT item 4).

The reference gets HTML5 tree construction from html5ever
(/root/reference/src/markdown_converter.rs:78-86). These cases are
modeled on the html5lib-tests tree-construction corpus (tests1.dat /
tables01.dat / adoption01.dat shapes) restricted to what affects TEXT
EXTRACTION: in-table foster parenting, implied tbody/tr, orphan table
tags, heading auto-close, nested-anchor closing, self-closing non-voids.

Each expected serialization below is the html5ever/spec outcome.
"""

import pytest

from markdown_lab_spark.oracle.htmldom import parse_document
from markdown_lab_spark.oracle.markdown_converter import (
    convert_html,
    parse_tree_to_document,
)

BODY = [
    # (input, expected <body> inner HTML) — spec/html5ever tree shapes
    (
        "<table><tr><td>x</td></tr></table>",
        "<table><tbody><tr><td>x</td></tr></tbody></table>",
    ),
    (
        "<table><td>cell</td></table>",
        "<table><tbody><tr><td>cell</td></tr></tbody></table>",
    ),
    (  # tables01.dat-style: non-whitespace text in table is fostered
        "<table>loose<tr><td>x</td></tr></table>",
        "loose<table><tbody><tr><td>x</td></tr></tbody></table>",
    ),
    (  # element fostering: <p> may not live between table rows
        "<table><p>para</p><tr><td>x</td></tr></table>",
        "<p>para</p><table><tbody><tr><td>x</td></tr></tbody></table>",
    ),
    (  # whitespace-only in-table text stays inside the table
        "<table>  <tr><td>x</td></tr></table>",
        "<table>  <tbody><tr><td>x</td></tr></tbody></table>",
    ),
    (  # orphan cell/row tags outside any table are ignored (spec parse error)
        "<td>orphan</td><p>k</p>",
        "orphan<p>k</p>",
    ),
    (
        "<tr><td>a</td></tr><p>k</p>",
        "a<p>k</p>",
    ),
    (  # tests1.dat-style: heading start tag pops an open heading
        "<h1>one<h2>two</h2>",
        "<h1>one</h1><h2>two</h2>",
    ),
    (  # nested <a> is illegal; the former anchor is closed
        '<a href="1">x<a href="2">y</a>',
        '<a href="1">x</a><a href="2">y</a>',
    ),
    (  # a self-closing slash on a non-void element is ignored
        "<div/>text</div>",
        "<div>text</div>",
    ),
    (  # consecutive rows + fostered leading text
        "<table><tr>r1<td>c</td><tr><td>d</td></table>",
        "r1<table><tbody><tr><td>c</td></tr><tr><td>d</td></tr></tbody></table>",
    ),
    (  # deep misnesting: td closes td, sections close back to table
        "<table><tbody><tr><td>a<td>b</td></tr><tfoot><tr><td>c</table>",
        "<table><tbody><tr><td>a</td><td>b</td></tr></tbody>"
        "<tfoot><tr><td>c</td></tr></tfoot></table>",
    ),
    # ---- adoption agency CLONE step (adoption01.dat shapes) ---------------
    (  # the canonical case: block moves out, children re-wrapped in a copy
        "<b><p>a</b>b</p>",
        "<b></b><p><b>a</b>b</p>",
    ),
    (  # with leading text in the formatting element
        "<b>1<p>2</b>3</p>",
        "<b>1</b><p><b>2</b>3</p>",
    ),
    (  # anchor variant, attributes preserved on the clone
        '<a href="x">1<p>2</a>3</p>',
        '<a href="x">1</a><p><a href="x">2</a>3</p>',
    ),
    (  # formatting intermediate between fe and the block is cloned too
        "<b><i><p>a</b>b</p>",
        "<b><i></i></b><i><p><b>a</b>b</p></i>",
    ),
    (  # scope boundary: a </b> inside a cell cannot reach a <b> outside
        # the table — the token is IGNORED, so <b> is still open after
        # </table> and the trailing text lands inside it
        "<b><table><tbody><tr><td>x</b></td></tr></table>after",
        "<b><table><tbody><tr><td>x</td></tr></tbody></table>after</b>",
    ),
    (  # nested <a> start runs the adoption agency with the clone step
        '<a href="1">1<p>2<a href="2">3',
        '<a href="1">1</a><p><a href="1">2</a><a href="2">3</a></p>',
    ),
    # ---- active-formatting-elements RECONSTRUCTION (round-4; the one
    # html5ever tree-builder behavior round 3 left unmodeled). A block
    # boundary pops a formatting element off the open stack but not out
    # of the AFE list, so later siblings re-open it as a clone. --------------
    (  # the canonical case: <b> re-opens inside the second paragraph
        "<p>1<b>2<p>3",
        "<p>1<b>2</b></p><p><b>3</b></p>",
    ),
    (  # text directly in body after the paragraph closes reconstructs
        # too; the final </b> then adopts the last paragraph back out of
        # the reconstructed clone, leaving "4" in it bare
        "<p><b>1</p>2<p>3</b>4",
        "<p><b>1</b></p><b>2</b><p><b>3</b>4</p>",
    ),
    (  # nested formatting reconstructs in order (outermost first)
        "<p><b><i>1<p>2",
        "<p><b><i>1</i></b></p><p><b><i>2</i></b></p>",
    ),
    (  # li boundaries behave like p boundaries
        "<ul><li><b>1<li>2</ul>",
        "<ul><li><b>1</b></li><li><b>2</b></li></ul>",
    ),
    (  # heading variant
        "<b>x<h1>y</h1>z",
        "<b>x<h1>y</h1>z</b>",
    ),
    (  # cell boundary is an AFE scope MARKER: formatting opened in one
        # cell must not reconstruct into the next cell
        "<table><tr><td><b>1</td><td>2</td></tr></table>",
        "<table><tbody><tr><td><b>1</b></td><td>2</td></tr></tbody></table>",
    ),
    (  # an end tag whose element is in the AFE but no longer on the
        # stack cancels the pending reconstruction (spec: remove entry)
        "<p><b>1</p></b>2",
        "<p><b>1</b></p>2",
    ),
    (  # an <a> start tag consults the AFE (not the stack): the stale
        # entry of a block-closed anchor is removed, NOT reconstructed
        # around the new anchor
        '<p><a href="1">x</p><a href="2">z',
        '<p><a href="1">x</a></p><a href="2">z</a>',
    ),
    # ---- dd/dt/option auto-close (round-4; tests1.dat shapes) -------------
    (
        "<dl><dd>1<dd>2</dl>",
        "<dl><dd>1</dd><dd>2</dd></dl>",
    ),
    (
        "<dl><dt>a<dd>b</dl>",
        "<dl><dt>a</dt><dd>b</dd></dl>",
    ),
    (
        "<select><option>1<option>2</select>",
        "<select><option>1</option><option>2</option></select>",
    ),
    (  # optgroup pops an open option AND an open optgroup
        "<select><optgroup><option>1<optgroup><option>2</select>",
        "<select><optgroup><option>1</option></optgroup>"
        "<optgroup><option>2</option></optgroup></select>",
    ),
    (  # AFE reconstruction works across dd boundaries like p/li
        "<dl><dd><b>1<dd>2</dl>",
        "<dl><dd><b>1</b></dd><dd><b>2</b></dd></dl>",
    ),
    # ---- end-tags-as-elements + retagging (round-4; tests1.dat shapes) ----
    (  # </p> with no open p inserts an empty p (parse-error recovery)
        "x</p>y",
        "x<p></p>y",
    ),
    (  # </br> is treated as a br START tag
        "x</br>y",
        "x<br>y",
    ),
    (  # the image start tag is retagged to img (void)
        '<image src="i.png">t',
        '<img src="i.png">t',
    ),
    (  # a button start tag closes an open button
        "<button>a<button>b",
        "<button>a</button><button>b</button>",
    ),
    (  # button is a "special" element: it is a furthest block for the
        # adoption agency, so trailing text stays INSIDE it
        "<b><button>x</b>y",
        "<b></b><button><b>x</b>y</button>",
    ),
    (  # a nobr start tag with a nobr in scope runs the adoption agency
        "<nobr>a<nobr>b",
        "<nobr>a</nobr><nobr>b</nobr>",
    ),
]


@pytest.mark.parametrize("html,expected", BODY, ids=[h[:40] for h, _ in BODY])
def test_tree_shape(html, expected):
    doc = parse_document(f"<html><body>{html}</body></html>")
    body = next(
        el for el in doc.root_element().iter_elements() if el.tag == "body"
    )
    assert body.inner_html() == expected


def test_fostered_paragraph_not_polluted_by_cells():
    """The extraction-level reason this matters: without foster parenting
    a <tr> opened inside an unclosed <p> would pour cell text into the
    paragraph. html5ever keeps the paragraph clean."""
    html = (
        "<html><body><table><p>one<tr><td>cell text</td></tr></table>"
        "</body></html>"
    )
    doc = parse_tree_to_document(parse_document(html), "https://e.com/")
    assert doc.paragraphs == ["one"]


def test_orphan_row_text_not_a_paragraph():
    md = convert_html(
        "<html><body><tr><td>loose</td></tr><p>real</p></body></html>",
        "https://e.com/",
        "markdown",
    )
    assert "real" in md and "loose" not in md


def test_nested_anchor_text_attribution():
    md = convert_html(
        '<html><body><p><a href="/one">first<a href="/two">second</a></p>'
        "</body></html>",
        "https://e.com/",
        "markdown",
    )
    # without the auto-close, the first link's text would swallow "second"
    assert "[first](https://e.com/one)" in md
    assert "[second](https://e.com/two)" in md


def test_heading_autoclose_extraction():
    md = convert_html(
        "<html><body><h1>alpha<h2>beta</h2></body></html>",
        "https://e.com/",
        "markdown",
    )
    assert "# alpha\n" in md and "## beta" in md
    assert "# alphabeta" not in md


def test_adoption_agency_block_text_attribution():
    """<b><p>x</b>y</p>: html5ever keeps y INSIDE the paragraph (the
    adoption agency reparents rather than popping the block). Round 1
    popped the p with the b, leaking y to body."""
    md = convert_html(
        "<html><body><b><p>first part</b> second part</p></body></html>",
        "https://e.com/",
        "markdown",
    )
    assert "first part second part" in md


def test_adoption_agency_inline_only_unchanged():
    """all-inline misnesting stays within the same block: text intact."""
    md = convert_html(
        "<html><body><p><i>a<b>c</i>d</b></p></body></html>",
        "https://e.com/",
        "markdown",
    )
    assert "acd" in md


def test_formatting_end_does_not_escape_cell():
    """a </b> whose matching element is outside the cell must not pop the
    cell (fostering/scope rule)."""
    doc = parse_document(
        "<html><body><b><table><tr><td>in cell</b> still in cell</td></tr>"
        "</table></body></html>"
    )
    cells = [el for el in doc.root_element().iter_elements() if el.tag == "td"]
    assert len(cells) == 1
    assert cells[0].text() == "in cell still in cell"


def test_tag_soup_serialize_reparse_fixed_point():
    """Robustness fuzz: for random tag soup, parse -> serialize ->
    re-parse -> serialize must be a fixed point (the spec's tree
    construction is idempotent on its own serialized output — html5ever
    round-trips the same way). Catches tree-builder instability from the
    AFE/auto-close machinery without needing a second implementation."""
    import random

    from markdown_lab_spark.oracle.htmldom import parse_document

    # excluded from the alphabet: table tags (foster parenting REORDERS
    # misplaced content, so serialize->reparse legitimately differs — the
    # spec itself is not a fixed point there) and nobr/a (their START
    # tags run the adoption agency, so re-parsing an adoption-produced
    # clone chain restructures again, also per spec). Both exclusions are
    # PINNED as explicit divergence fixtures with expected outputs in
    # test_adoption_on_start_tag_is_not_a_fixed_point and
    # test_foster_parenting_across_formatting_is_not_a_fixed_point below.
    tags = ["b", "i", "p", "div", "li", "ul", "dd", "dl", "span",
            "button", "em", "h1", "option", "select"]
    rng = random.Random(42)
    for _case in range(300):
        parts = []
        for _ in range(rng.randint(1, 14)):
            t = rng.choice(tags)
            kind = rng.random()
            if kind < 0.45:
                parts.append(f"<{t}>")
            elif kind < 0.75:
                parts.append(f"</{t}>")
            else:
                parts.append(rng.choice(["x", " ", "1 2", "&amp;"]))
        soup = "".join(parts)

        def body_html(src):
            doc = parse_document(f"<html><body>{src}</body></html>")
            body = next(
                el for el in doc.root_element().iter_elements()
                if el.tag == "body"
            )
            return body.inner_html()

        once = body_html(soup)
        twice = body_html(once)
        assert once == twice, (soup, once, twice)


def test_tag_soup_with_tables_never_crashes():
    """Foster-parenting soup isn't serialize-stable by spec, but it must
    never raise and must re-parse cleanly."""
    import random

    from markdown_lab_spark.oracle.htmldom import parse_document

    tags = ["table", "tr", "td", "tbody", "caption", "b", "p", "button",
            "dd", "li", "a", "h1"]
    rng = random.Random(7)
    for _case in range(300):
        soup = "".join(
            rng.choice([f"<{rng.choice(tags)}>", f"</{rng.choice(tags)}>", "x "])
            for _ in range(rng.randint(1, 16))
        )
        doc = parse_document(f"<html><body>{soup}</body></html>")
        out = doc.root_element().html()
        parse_document(out)  # re-parse of our own serialization succeeds


def _body_roundtrip(src):
    from markdown_lab_spark.oracle.htmldom import parse_document

    doc = parse_document(f"<html><body>{src}</body></html>")
    body = next(
        el for el in doc.root_element().iter_elements() if el.tag == "body"
    )
    return body.inner_html()


def test_adoption_on_start_tag_is_not_a_fixed_point():
    """Round-4 verdict item 6, family 1 (a/nobr START-tag adoption):
    a second <a>/<nobr> start tag runs the adoption agency (the spec's
    'in body' insertion mode: an <a> start tag with an a element in the
    active formatting list triggers the agency and removes it; html5ever
    implements the same restructure, the machinery the reference's
    conversion rides via markdown_converter.rs:78-86). The agency emits
    clone chains whose serialization, when RE-parsed, runs the agency
    again — so serialize->reparse legitimately differs on pass 1 and
    converges on pass 2. These fixtures pin both passes exactly; they
    are the documented exclusion of the 300-case fixed-point fuzz."""
    cases = [
        (
            "xx<a><div><b><a><b>",
            'xx<a></a><div><a><b><a><b></b></a></b></a></div>',
            'xx<a></a><div><a><b></b></a><b><a><b></b></a></b></div>',
        ),
        (
            "<nobr><div><a><nobr>",
            "<nobr></nobr><div><nobr><a><nobr></nobr></a></nobr></div>",
            "<nobr></nobr><div><nobr><a></a></nobr><a><nobr></nobr></a></div>",
        ),
    ]
    for soup, want_once, want_twice in cases:
        once = _body_roundtrip(soup)
        twice = _body_roundtrip(once)
        assert once == want_once, (soup, once)
        assert twice == want_twice, (soup, twice)
        assert once != twice  # the documented divergence, load-bearing
        # ...and the restructure CONVERGES: pass 2 is a true fixed point
        assert _body_roundtrip(twice) == twice


def test_foster_parenting_across_formatting_is_not_a_fixed_point():
    """Round-4 verdict item 6, family 2 (foster parenting across open
    formatting elements): content misnested inside a table is
    foster-parented BEFORE the table while the open <a> formatting
    context wraps it (spec 13.2.6.1 'foster parenting'; html5ever's
    tree builder does the identical move). Serializing that tree nests
    the fostered content inside the formatting element ahead of the
    table, and RE-parsing runs the a-in-a adoption agency on it — pass 1
    and pass 2 differ per spec, converging at pass 2. Pinned exactly."""
    cases = [
        (
            "<a><table></tr><a><b>x",
            "<a><a><b>x</b></a><table></table></a>",
            "<a></a><a><b>x</b></a><table></table>",
        ),
        (
            "<a><a><table>xx<a><button>x",
            "<a></a><a>xx<a><button>x</button></a><table></table></a>",
            "<a></a><a>xx</a><a><button>x</button></a><table></table>",
        ),
    ]
    for soup, want_once, want_twice in cases:
        once = _body_roundtrip(soup)
        twice = _body_roundtrip(once)
        assert once == want_once, (soup, once)
        assert twice == want_twice, (soup, twice)
        assert once != twice
        assert _body_roundtrip(twice) == twice
