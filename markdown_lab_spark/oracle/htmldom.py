"""Minimal HTML5-ish DOM used by the conversion oracle.

Pure-stdlib replacement for the reference's html5ever/scraper stack
(reference: src/markdown_converter.rs:76-94, src/html_parser.rs). The
reference parses with html5ever (entity decoding, implied html/head/body),
re-serializes, string-replace-cleans, re-parses, then extracts content with
CSS selectors in document order. This module reproduces the pieces of that
behavior the conversion semantics depend on:

- entity decoding at parse time (``convert_charrefs=True``; raw-text
  elements like <script>/<style> keep their text verbatim),
- implied ``html``/``head``/``body`` wrapper elements,
- html5ever-style serialization (text re-escaped ``& < > \xa0``; attributes
  double-quoted with ``& " \xa0`` escaped; void elements; raw-text elements
  unescaped),
- ``element.text()`` = concatenation of descendant text nodes with NO
  separator (src/markdown_converter.rs:146 ``.text().collect::<String>()``),
- document-order CSS ``select`` for the simple selector subset the
  reference uses (tag, #id, .class, tag[attr], comma lists).

It is NOT a general browser-grade parser; it is the executable semantics
oracle for this engine's corpus + the reference's own test fixtures.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator, List, Optional, Tuple

VOID_ELEMENTS = frozenset(
    "area base basefont bgsound br col embed frame hr img input keygen "
    "link meta param source track wbr".split()
)

# serialized with unescaped text per the HTML serialization spec
RAW_TEXT_ELEMENTS = frozenset(
    "style script xmp iframe noembed noframes plaintext".split()
)

# start tags routed into an implicit <head> before body content begins
HEAD_ELEMENTS = frozenset(
    "base basefont bgsound link meta title style script noscript template".split()
)

# block-ish elements whose start tag closes an open <p>
P_CLOSERS = frozenset(
    "address article aside blockquote details dialog dir div dl fieldset "
    "figcaption figure footer form h1 h2 h3 h4 h5 h6 header hgroup hr main "
    "menu nav ol p pre section summary table ul".split()
)

HEADINGS = frozenset("h1 h2 h3 h4 h5 h6".split())

# the spec's active formatting elements (adoption agency participants)
FORMATTING_ELEMENTS = frozenset(
    "a b big code em font i nobr s small strike strong tt u".split()
)
# block-ish "special" elements an adoption-agency end tag must not pop
_SPECIAL_SCOPE = P_CLOSERS | frozenset(
    "li dd dt td th caption tr tbody thead tfoot body html "
    "button applet marquee object select option optgroup".split()
)
# *has an element in scope* boundaries (spec 13.2.4.2): a formatting end
# tag whose element sits above one of these is a parse error and IGNORED
# (html5ever does the same — e.g. a </b> inside a td cannot reach a <b>
# opened outside the table)
_SCOPE_BOUNDARY = frozenset("html table td th caption template".split())

# tree-construction "in table" machinery (html5ever gives the reference
# this via the spec, src/markdown_converter.rs:78-86): while one of these
# is the current node, disallowed content is FOSTER-PARENTED before the
# table instead of nesting inside it
TABLE_CONTEXT = frozenset("table tbody thead tfoot tr".split())
TABLE_STRUCTURAL = frozenset(
    "caption colgroup col tbody thead tfoot tr td th".split()
)
# non-structural start tags the in-table modes insert in place
IN_TABLE_OK = frozenset("script style template form".split())

# start tags with NO special in-body tree-construction logic: everything
# outside this set takes the plain append fast path in handle_starttag
_SPECIAL_START = (
    frozenset("html head body li a dd dt option optgroup button".split())
    | TABLE_STRUCTURAL
    | P_CLOSERS
    | HEADINGS
)


class Node:
    __slots__ = ("parent",)


class TextNode(Node):
    __slots__ = ("data",)

    def __init__(self, data: str):
        self.parent = None
        self.data = data


class CommentNode(Node):
    __slots__ = ("data",)

    def __init__(self, data: str):
        self.parent = None
        self.data = data


class Element(Node):
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: Optional[List[Tuple[str, str]]] = None):
        self.parent = None
        self.tag = tag
        self.attrs = list(attrs or [])
        self.children: List[Node] = []

    # --- attribute helpers -------------------------------------------------
    def attr(self, name: str) -> Optional[str]:
        for k, v in self.attrs:
            if k == name:
                return v
        return None

    def classes(self) -> List[str]:
        cls = self.attr("class")
        return cls.split() if cls else []

    def append(self, node: Node) -> None:
        node.parent = self
        self.children.append(node)

    # --- traversal (iterative: hostile pages nest 1000s deep) --------------
    def iter_elements(self) -> Iterator["Element"]:
        """Descendant elements in document (pre-)order, self excluded."""
        stack = [iter(self.children)]
        while stack:
            for child in stack[-1]:
                if isinstance(child, Element):
                    yield child
                    stack.append(iter(child.children))
                    break
            else:
                stack.pop()

    def iter_text_nodes(self) -> Iterator[str]:
        stack = [iter(self.children)]
        while stack:
            for child in stack[-1]:
                if isinstance(child, TextNode):
                    yield child.data
                elif isinstance(child, Element):
                    stack.append(iter(child.children))
                    break
            else:
                stack.pop()

    def text(self) -> str:
        """All descendant text concatenated with no separator.

        Mirrors scraper's ``element.text().collect::<String>()`` as used in
        the conversion path (src/markdown_converter.rs:146,163,182).
        """
        return "".join(self.iter_text_nodes())

    def text_joined(self) -> str:
        """Whitespace-collapsed, space-joined variant.

        Mirrors ``get_element_text`` (src/html_parser.rs:293-301).
        """
        return " ".join(" ".join(self.iter_text_nodes()).split())

    # --- serialization -----------------------------------------------------
    def html(self) -> str:
        """Outer HTML, html5ever-style serialization."""
        out: List[str] = []
        _serialize(self, out)
        return "".join(out)

    def inner_html(self) -> str:
        out: List[str] = []
        for child in self.children:
            _serialize(child, out)
        return "".join(out)

    def select(self, selector: "Selector") -> Iterator["Element"]:
        for el in self.iter_elements():
            if selector.matches(el):
                yield el

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<Element {self.tag} attrs={self.attrs} kids={len(self.children)}>"


class HtmlDocument:
    """Parsed document; ``root_element`` is the (possibly implied) <html>."""

    def __init__(self, root: Element):
        self.root = root

    def root_element(self) -> Element:
        return self.root

    def select(self, selector: "Selector") -> Iterator[Element]:
        if selector.matches(self.root):
            yield self.root
        yield from self.root.select(selector)

    def html(self) -> str:
        return self.root.html()


def _escape_text(text: str) -> str:
    if ("&" not in text and "<" not in text and ">" not in text
            and "\xa0" not in text):
        return text  # hot path: most text nodes need no escaping
    return (
        text.replace("&", "&amp;")
        .replace("\xa0", "&nbsp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
    )


def _escape_attr(text: str) -> str:
    if "&" not in text and '"' not in text and "\xa0" not in text:
        return text
    return (
        text.replace("&", "&amp;").replace("\xa0", "&nbsp;").replace('"', "&quot;")
    )


def _serialize(node: Node, out: List[str], raw: bool = False) -> None:
    # iterative (explicit stack): hostile web pages nest thousands deep and
    # this runs inside Spark tasks where a RecursionError kills the task.
    # Text/comment children are emitted inline (no stack round-trip) and
    # the no-attrs open tag is a single concat — this runs twice per page
    # in the clean-verify path, so constant factors matter.
    stack: List[object] = [(node, raw)]
    append = out.append
    while stack:
        item = stack.pop()
        if type(item) is str:  # pending close tag
            append(item)
            continue
        cur, cur_raw = item  # type: ignore[misc]
        tcur = type(cur)
        if tcur is TextNode:
            append(cur.data if cur_raw else _escape_text(cur.data))
            continue
        if tcur is CommentNode:
            append("<!--" + cur.data + "-->")
            continue
        tag = cur.tag
        if cur.attrs:
            parts = ["<", tag]
            for k, v in cur.attrs:
                parts.append(" " + k + '="' + _escape_attr(v) + '"')
            parts.append(">")
            append("".join(parts))
        else:
            append("<" + tag + ">")
        if tag in VOID_ELEMENTS:
            continue
        stack.append("</" + tag + ">")
        child_raw = tag in RAW_TEXT_ELEMENTS
        children = cur.children
        if len(children) == 1 and type(children[0]) is TextNode:
            txt = children[0]
            append(txt.data if child_raw else _escape_text(txt.data))
            append(stack.pop())  # the close tag just pushed
            continue
        for child in reversed(children):
            stack.append((child, child_raw))


class _EndMark:
    __slots__ = ("key",)

    def __init__(self, key: int):
        self.key = key


def serialize_with_spans(root: Element, want_ids) -> Tuple[str, dict]:
    """Serialize ``root`` once, returning (html, {id(el): (start, end)})
    for the elements in ``want_ids``. A subtree's serialization is exactly
    ``html[start:end]`` — compositionality the clean-path verifier uses to
    prove string-replace removal equals tree-level removal without a
    second full serialization."""
    out: List[str] = []
    spans: dict = {}
    starts: dict = {}
    pos = 0
    stack: List[object] = [(root, False)]
    append = out.append
    while stack:
        item = stack.pop()
        t = type(item)
        if t is str:
            append(item)
            pos += len(item)
            continue
        if t is _EndMark:
            spans[item.key] = (starts[item.key], pos)
            continue
        cur, cur_raw = item  # type: ignore[misc]
        tcur = type(cur)
        if tcur is TextNode:
            piece = cur.data if cur_raw else _escape_text(cur.data)
            append(piece)
            pos += len(piece)
            continue
        if tcur is CommentNode:
            piece = "<!--" + cur.data + "-->"
            append(piece)
            pos += len(piece)
            continue
        key = id(cur)
        marked = key in want_ids
        if marked:
            starts[key] = pos
        tag = cur.tag
        if cur.attrs:
            parts = ["<", tag]
            for k, v in cur.attrs:
                parts.append(" " + k + '="' + _escape_attr(v) + '"')
            parts.append(">")
            piece = "".join(parts)
        else:
            piece = "<" + tag + ">"
        append(piece)
        pos += len(piece)
        if tag in VOID_ELEMENTS:
            if marked:
                spans[key] = (starts[key], pos)
            continue
        if marked:
            stack.append(_EndMark(key))
        stack.append("</" + tag + ">")
        child_raw = tag in RAW_TEXT_ELEMENTS
        for child in reversed(cur.children):
            stack.append((child, child_raw))
    return "".join(out), spans


# scope marker in the active-formatting-elements list (spec 13.2.4.3):
# pushed when a td/th/caption opens, so formatting context never leaks
# across cell boundaries during reconstruction
_AFE_MARKER = object()


class _TreeBuilder(HTMLParser):
    """Simplified HTML5 tree construction (implied html/head/body)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.html_el = Element("html")
        self.head_el: Optional[Element] = None
        self.body_el: Optional[Element] = None
        # modes: before_head -> in_head -> in_body
        self.mode = "before_head"
        self.stack: List[Element] = [self.html_el]
        self.saw_explicit_html = False
        # active formatting elements (spec 13.2.4.3): formatting elements
        # whose tags are still "open" for RECONSTRUCTION even after a
        # block boundary popped them off the stack (<p><b>x<p>y puts the
        # second paragraph's y back inside a fresh <b>). html5ever gives
        # the reference this via the spec (src/markdown_converter.rs:78-86).
        self.afe: List = []

    # -- active formatting elements ------------------------------------------
    def _on_stack(self, el: Element) -> bool:
        return any(s is el for s in self.stack)

    def _afe_push(self, el: Element) -> None:
        # Noah's Ark clause: at most 3 entries with identical tag+attrs
        # after the last marker; pushing a 4th drops the EARLIEST
        matches = []
        key = sorted(el.attrs)
        for i in range(len(self.afe) - 1, -1, -1):
            e = self.afe[i]
            if e is _AFE_MARKER:
                break
            if e.tag == el.tag and sorted(e.attrs) == key:
                matches.append(i)
        if len(matches) >= 3:
            del self.afe[matches[-1]]
        self.afe.append(el)

    def _afe_remove(self, el: Element) -> None:
        for i in range(len(self.afe) - 1, -1, -1):
            if self.afe[i] is el:
                del self.afe[i]
                return

    def _afe_clear_to_marker(self) -> None:
        while self.afe:
            e = self.afe.pop()
            if e is _AFE_MARKER:
                return

    def _stack_del(self, idx: int) -> None:
        """Pop stack[idx:], clearing formatting context when a cell
        boundary (td/th/caption) closes — the spec's 'close the cell'
        clears the AFE list to the last marker."""
        for el in self.stack[idx:]:
            if el.tag in ("td", "th", "caption"):
                self._afe_clear_to_marker()
                break
        del self.stack[idx:]

    def _reconstruct_afe(self) -> None:
        """Spec 13.2.4.3 'reconstruct the active formatting elements':
        re-open (as clones) every AFE entry that a block boundary popped
        off the open-elements stack, innermost context first."""
        if not self.afe:
            return  # the overwhelmingly common case: well-formed markup
        last = self.afe[-1]
        if last is _AFE_MARKER or self._on_stack(last):
            return
        i = len(self.afe) - 1
        while i > 0:
            e = self.afe[i - 1]
            if e is _AFE_MARKER or self._on_stack(e):
                break
            i -= 1
        for j in range(i, len(self.afe)):
            entry = self.afe[j]
            clone = Element(entry.tag, list(entry.attrs))
            cur = self._current()
            if cur.tag in TABLE_CONTEXT:
                self._foster_insert(clone)
            else:
                cur.append(clone)
            self.stack.append(clone)
            self.afe[j] = clone

    # -- mode helpers --------------------------------------------------------
    def _ensure_head(self) -> Element:
        if self.head_el is None:
            self.head_el = Element("head")
            self.html_el.append(self.head_el)
        return self.head_el

    def _ensure_body(self) -> Element:
        self._ensure_head()
        if self.body_el is None:
            self.body_el = Element("body")
            self.html_el.append(self.body_el)
        return self.body_el

    def _current(self) -> Element:
        return self.stack[-1]

    # -- parser callbacks ----------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        attrs = [(k, v if v is not None else "") for k, v in attrs]
        if tag == "image":
            tag = "img"  # spec: the image start tag is retagged to img
        if self.mode == "in_body" and tag not in _SPECIAL_START:
            # plain in-body tag: the common case, none of the mode /
            # close-implication / adoption logic below applies. Spec: 'any
            # other start tag' (and every formatting start tag) first
            # reconstructs the active formatting elements.
            if tag == "nobr" and any(
                e.tag == "nobr" for e in self.stack
                if isinstance(e, Element)
            ):
                # spec: a nobr start tag with a nobr in scope runs the
                # adoption agency (nesting nobr is a parse error)
                self._adoption_agency("nobr")
            cur = self.stack[-1]
            if cur.tag not in TABLE_CONTEXT:
                self._reconstruct_afe()
                cur = self.stack[-1]
            el = Element(tag, attrs)
            if cur.tag in TABLE_CONTEXT and tag not in IN_TABLE_OK:
                self._foster_insert(el)
            else:
                cur.append(el)
            if tag not in VOID_ELEMENTS:
                self.stack.append(el)
            if tag in FORMATTING_ELEMENTS:
                self._afe_push(el)
            return
        if tag == "html":
            self.saw_explicit_html = True
            self.html_el.attrs.extend(a for a in attrs if a[0] not in dict(self.html_el.attrs))
            return
        if tag == "head":
            self._ensure_head()
            self.mode = "in_head"
            self.stack = [self.html_el, self.head_el]  # type: ignore[list-item]
            return
        if tag == "body":
            self._ensure_body()
            self.mode = "in_body"
            self.stack = [self.html_el, self.body_el]  # type: ignore[list-item]
            return

        if self.mode in ("before_head", "in_head"):
            if tag in HEAD_ELEMENTS:
                head = self._ensure_head()
                self.mode = "in_head"
                el = Element(tag, attrs)
                head.append(el)
                if tag not in VOID_ELEMENTS:
                    self.stack = [self.html_el, head, el]
                else:
                    self.stack = [self.html_el, head]
                return
            # non-head element forces body
            self._ensure_body()
            self.mode = "in_body"
            self.stack = [self.html_el, self.body_el]  # type: ignore[list-item]

        # in body -----------------------------------------------------------
        if tag in TABLE_STRUCTURAL:
            ti = self._open_table_index()
            if ti is None:
                return  # parse error per spec: td/tr/... outside a table is ignored
            self._pop_for_table_structural(tag, ti)
            el = Element(tag, attrs)
            self._current().append(el)
            if tag not in VOID_ELEMENTS:  # col is void
                self.stack.append(el)
            if tag in ("td", "th", "caption"):
                self.afe.append(_AFE_MARKER)  # formatting scope boundary
            return
        if tag == "button":
            self._close_if_open("button")
        if tag in P_CLOSERS:
            self._close_if_open("p")
        if tag == "li":
            self._close_li()
        if tag in ("dd", "dt"):
            # spec: a dd/dt start tag closes an open p and any open dd/dt
            self._close_if_open("p")
            self._close_dd_dt()
        if tag == "option" and self._current().tag == "option":
            self.stack.pop()  # spec: an option start tag pops an open option
        if tag == "optgroup":
            if self._current().tag == "option":
                self.stack.pop()
            if self._current().tag == "optgroup":
                self.stack.pop()
        if tag in HEADINGS and self._current().tag in HEADINGS:
            self.stack.pop()  # spec: h_n start with a heading as current node pops it
        if tag == "a":
            self._close_open_a()  # nested <a> is illegal; adoption agency closes it
            if self._current().tag not in TABLE_CONTEXT:
                self._reconstruct_afe()  # <a> is a formatting element
        el = Element(tag, attrs)
        cur = self._current()
        if cur.tag in TABLE_CONTEXT and tag not in IN_TABLE_OK:
            self._foster_insert(el)
        else:
            cur.append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)
        if tag == "a":
            self._afe_push(el)

    def handle_startendtag(self, tag: str, attrs) -> None:
        # HTML5: a self-closing slash on a non-void element is ignored —
        # the tag is an ordinary start tag and stays OPEN (html5ever does
        # the same); for void elements the paths are identical anyway
        self.handle_starttag(tag, attrs)

    # -- in-table helpers -----------------------------------------------------
    def _open_table_index(self) -> Optional[int]:
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == "table":
                return i
        return None

    def _pop_for_table_structural(self, tag: str, ti: int) -> None:
        """Close back to the right container, implying tbody/tr like the
        spec ('in table' insertion modes) so <table><td>x ends up as
        table>tbody>tr>td."""
        if tag == "tr":
            for i in range(len(self.stack) - 1, ti - 1, -1):
                if self.stack[i].tag in ("tbody", "thead", "tfoot", "table"):
                    self._stack_del(i + 1)
                    break
            if self._current().tag == "table":
                tb = Element("tbody", [])
                self._current().append(tb)
                self.stack.append(tb)
        elif tag in ("td", "th"):
            for i in range(len(self.stack) - 1, ti - 1, -1):
                if self.stack[i].tag in ("tr", "tbody", "thead", "tfoot", "table"):
                    self._stack_del(i + 1)
                    break
            if self._current().tag == "table":
                tb = Element("tbody", [])
                self._current().append(tb)
                self.stack.append(tb)
            if self._current().tag in ("tbody", "thead", "tfoot"):
                tr = Element("tr", [])
                self._current().append(tr)
                self.stack.append(tr)
        else:  # caption/colgroup/col/tbody/thead/tfoot
            self._stack_del(ti + 1)

    def _foster_insert(self, node: Node) -> None:
        """Insert before the innermost open table (foster parenting)."""
        ti = self._open_table_index()
        assert ti is not None
        table = self.stack[ti]
        parent = table.parent or self.stack[ti - 1]
        idx = parent.children.index(table)
        if isinstance(node, TextNode) and idx > 0 and isinstance(
            parent.children[idx - 1], TextNode
        ):
            parent.children[idx - 1].data += node.data
            return
        node.parent = parent
        parent.children.insert(idx, node)

    def _close_open_a(self) -> None:
        # spec: an <a> start tag whose AFE list holds an "a" entry after
        # the last marker is a parse error — run the adoption agency for
        # "a", then remove any leftover entry from the list AND the
        # stack. The AFE check (not a stack check) is what prevents a
        # closed-by-block-boundary anchor from being reconstructed
        # around the new one (<p><a href=1>x</p><a href=2> must NOT nest
        # the second anchor in a clone of the first).
        for i in range(len(self.afe) - 1, -1, -1):
            e = self.afe[i]
            if e is _AFE_MARKER:
                break
            if e.tag == "a":
                if self._on_stack(e):
                    self._adoption_agency("a")
                self._afe_remove(e)  # idempotent if adoption removed it
                for j in range(len(self.stack) - 1, 0, -1):
                    if self.stack[j] is e:
                        del self.stack[j]
                        break
                return
        # stack-only fallback (an <a> on the stack with no AFE entry —
        # e.g. its entry was cleared by a cell marker): prior behavior
        for i in range(len(self.stack) - 1, 0, -1):
            t = self.stack[i].tag
            if t == "a":
                self._adoption_agency("a")
                return
            if t in _SCOPE_BOUNDARY or t == "body":
                return

    @staticmethod
    def _detach(node: Node) -> None:
        p = node.parent
        if p is not None and node in p.children:
            p.children.remove(node)
        node.parent = None

    def _adoption_agency(self, tag: str) -> None:
        """HTML5 adoption agency (spec 13.2.6.4.7) including the CLONE
        step: a formatting end tag whose scope contains an open block
        moves the block to the formatting element's parent and re-wraps
        the block's existing children in a COPY of the formatting element
        (<b><p>a</b>b  =>  <b></b><p><b>a</b>b</p>), matching html5ever's
        tree shape (the reference gets this via html5ever,
        src/markdown_converter.rs:78-86), not just its text attribution.

        One outer iteration suffices: the spec's second iteration finds
        the freshly-inserted clone at the bottom of the stack with no
        furthest block below it and pops it straight back off, so the
        clone is simply never pushed here. The active-formatting-elements
        RECONSTRUCTION step is not modeled (it changes inline formatting
        shape only, never block text attribution).
        """
        # locate the formatting element, honoring scope boundaries
        fe_idx = None
        for i in range(len(self.stack) - 1, 0, -1):
            t = self.stack[i].tag
            if t == tag:
                fe_idx = i
                break
            if t in _SCOPE_BOUNDARY:
                return  # parse error per spec: not in scope, token ignored
        if fe_idx is None:
            # spec: a matching AFE entry NOT on the stack is simply
            # removed (the end tag "closes" the pending reconstruction)
            for i in range(len(self.afe) - 1, -1, -1):
                e = self.afe[i]
                if e is _AFE_MARKER:
                    break
                if e.tag == tag:
                    del self.afe[i]
                    break
            return  # unmatched end tag: ignored
        # furthest block: topmost special element below the formatting one
        fb_idx = None
        for k in range(fe_idx + 1, len(self.stack)):
            if self.stack[k].tag in _SPECIAL_SCOPE:
                fb_idx = k
                break
        if fb_idx is None:
            # inline-only misnesting: pop through (spec's no-furthest-block
            # branch pops all nodes up to and including the element, and
            # removes the element from the AFE list)
            self._afe_remove(self.stack[fe_idx])
            del self.stack[fe_idx:]
            return
        fe = self.stack[fe_idx]
        fb = self.stack[fb_idx]
        common = self.stack[fe_idx - 1]
        # inner loop: re-parent the furthest block through clones of the
        # formatting intermediates; ordinary intermediates leave the stack
        last: Element = fb
        mid_clones: List[Element] = []  # innermost (deepest) first
        for k in range(fb_idx - 1, fe_idx, -1):
            node = self.stack[k]
            if node.tag in FORMATTING_ELEMENTS:
                clone = Element(node.tag, list(node.attrs))
                self._detach(last)
                clone.append(last)
                last = clone
                mid_clones.append(clone)
                # the clone replaces the original in the AFE list too
                for a in range(len(self.afe) - 1, -1, -1):
                    if self.afe[a] is node:
                        self.afe[a] = clone
                        break
        self._detach(last)
        if common.tag in TABLE_CONTEXT:
            self._foster_insert(last)
        else:
            common.append(last)
        # the CLONE step: wrap the furthest block's children in a copy of
        # the formatting element
        fe_clone = Element(fe.tag, list(fe.attrs))
        for child in fb.children:
            child.parent = fe_clone
        fe_clone.children = fb.children
        fb.children = []
        fb.append(fe_clone)
        # AFE bookkeeping: the spec's step 19 would put fe_clone into the
        # AFE (and the stack), but its SECOND outer iteration immediately
        # hits the no-furthest-block branch for that clone — popping it
        # and removing it from the AFE. Net effect after both iterations:
        # fe is gone from the AFE and the clone never survives in it,
        # which is why browsers put trailing text ("<b><p>a</b>b") in the
        # paragraph bare, not inside another reconstructed <b>.
        self._afe_remove(fe)
        # stack: drop fe + ordinary intermediates, keep clones outer->inner
        self.stack[fe_idx:fb_idx] = list(reversed(mid_clones))

    def handle_endtag(self, tag: str) -> None:
        if tag == "br":
            # spec: an end tag br is treated as a br START tag (inserts
            # the element); every other void end tag is dropped
            self.handle_starttag("br", [])
            return
        if tag in VOID_ELEMENTS:
            return
        if tag == "p" and self.mode == "in_body":
            # spec: an end tag p with NO p in button scope is a parse
            # error handled by inserting an empty p first — so </p> in
            # bare body yields <p></p>, like html5ever
            for i in range(len(self.stack) - 1, 0, -1):
                t = self.stack[i].tag
                if t == "p":
                    break
                if t in ("button", "table", "td", "th", "caption", "body", "html"):
                    self.handle_starttag("p", [])
                    break
        if tag in ("html", "head", "body"):
            if tag == "head" and self.mode == "in_head":
                self.mode = "after_head"
                self.stack = [self.html_el]
            elif tag == "body":
                self.stack = [self.html_el]
            return
        if tag in FORMATTING_ELEMENTS:
            self._adoption_agency(tag)
            return
        # pop to matching open tag; ignore unmatched
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                self._stack_del(i)
                return

    def _close_if_open(self, tag: str) -> None:
        for i in range(len(self.stack) - 1, 0, -1):
            el = self.stack[i]
            if el.tag == tag:
                del self.stack[i:]
                return
            if el.tag in ("ul", "ol", "table", "body", "html"):
                return

    def _close_dd_dt(self) -> None:
        for i in range(len(self.stack) - 1, 0, -1):
            el = self.stack[i]
            if el.tag in ("dd", "dt"):
                del self.stack[i:]
                return
            if el.tag in ("dl", "body", "html"):
                return

    def _close_li(self) -> None:
        for i in range(len(self.stack) - 1, 0, -1):
            el = self.stack[i]
            if el.tag == "li":
                del self.stack[i:]
                return
            if el.tag in ("ul", "ol", "body", "html"):
                return

    def handle_data(self, data: str) -> None:
        if self.mode in ("before_head", "after_head") and not data.strip():
            return  # whitespace before head/body is dropped
        if self.mode == "in_head":
            if self._current() is not self.html_el:
                self._current().append(TextNode(data))
                return
            if not data.strip():
                return
            self._ensure_body()
            self.mode = "in_body"
            self.stack = [self.html_el, self.body_el]  # type: ignore[list-item]
        if self.mode in ("before_head", "after_head"):
            self._ensure_body()
            self.mode = "in_body"
            self.stack = [self.html_el, self.body_el]  # type: ignore[list-item]
        cur = self._current()
        if cur.tag in TABLE_CONTEXT and data.strip():
            # in-table character tokens with non-whitespace content are
            # foster-parented before the table (whitespace-only stays);
            # per-event granularity approximates the spec's pending-token
            # batch, which is exact for every corpus chunking seen
            self._foster_insert(TextNode(data))
            return
        # spec: character tokens in body reconstruct the active
        # formatting elements first (whitespace-only text inside a table
        # stays in the table without reconstruction)
        if cur.tag not in TABLE_CONTEXT:
            self._reconstruct_afe()
            cur = self._current()
        # merge adjacent text nodes so serialization is stable
        if cur.children and isinstance(cur.children[-1], TextNode):
            cur.children[-1].data += data
        else:
            cur.append(TextNode(data))

    def handle_comment(self, data: str) -> None:
        target = self._current()
        if self.mode in ("before_head", "after_head"):
            return  # comments outside head/body: dropped (we only need body parity)
        target.append(CommentNode(data))


def parse_document(html: str) -> HtmlDocument:
    """Parse via the fast complete-document tokenizer (htmltok) — same
    handler-call sequence as the stdlib parser (differentially fuzzed in
    tests/test_htmltok_differential.py), ~2x less tokenizer overhead."""
    from .htmltok import tokenize  # noqa: PLC0415

    builder = _TreeBuilder()
    tokenize(html or "", builder)
    builder._ensure_body()
    return HtmlDocument(builder.html_el)


def parse_document_stdlib(html: str) -> HtmlDocument:
    """Reference path: stdlib html.parser drives the same tree builder.
    Kept as the differential-testing oracle for htmltok."""
    builder = _TreeBuilder()
    builder.feed(html or "")
    builder.close()
    builder._ensure_body()
    return HtmlDocument(builder.html_el)


# --------------------------------------------------------------------------
# CSS selector subset: "tag", "#id", ".class", "tag[attr]", "tag.class",
# comma-separated lists. This covers every selector the reference compiles
# (src/html_parser.rs:22-60, src/markdown_converter.rs selectors).
# --------------------------------------------------------------------------
class _SimpleSelector:
    __slots__ = ("tag", "sel_id", "classes", "attrs")

    def __init__(self, spec: str):
        self.tag: Optional[str] = None
        self.sel_id: Optional[str] = None
        self.classes: List[str] = []
        self.attrs: List[str] = []
        token = ""
        kind = "tag"
        spec = spec.strip()
        i = 0
        while i <= len(spec):
            ch = spec[i] if i < len(spec) else None
            if ch in ("#", ".", "[", None):
                if token:
                    if kind == "tag":
                        self.tag = token.lower()
                    elif kind == "id":
                        self.sel_id = token
                    elif kind == "class":
                        self.classes.append(token)
                token = ""
                kind = {"#": "id", ".": "class", "[": "attr"}.get(ch or "", "tag")
                if ch == "[":
                    j = spec.index("]", i)
                    self.attrs.append(spec[i + 1 : j])
                    i = j
            else:
                token += ch
            i += 1

    def matches(self, el: Element) -> bool:
        if self.tag is not None and el.tag != self.tag:
            return False
        if self.sel_id is not None and el.attr("id") != self.sel_id:
            return False
        if self.classes:
            el_classes = el.classes()
            if any(c not in el_classes for c in self.classes):
                return False
        return all(el.attr(a) is not None for a in self.attrs)


class Selector:
    def __init__(self, spec: str):
        self.parts = [_SimpleSelector(p) for p in spec.split(",") if p.strip()]
        # fast-path partition: simple alternatives collapse to set probes
        # (matching is a boolean OR, so evaluation order is free); only
        # compound parts fall through to the per-part loop
        self._tag_only = frozenset(
            p.tag for p in self.parts
            if p.tag is not None and p.sel_id is None and not p.classes and not p.attrs
        )
        self._id_only = frozenset(
            p.sel_id for p in self.parts
            if p.sel_id is not None and p.tag is None and not p.classes and not p.attrs
        )
        self._class_only = frozenset(
            p.classes[0] for p in self.parts
            if len(p.classes) == 1 and p.tag is None and p.sel_id is None and not p.attrs
        )
        simple = len(self._tag_only) + len(self._id_only) + len(self._class_only)
        self._rest = (
            [] if simple == len(self.parts)
            else [
                p for p in self.parts
                if not (
                    (p.tag in self._tag_only and p.sel_id is None and not p.classes and not p.attrs)
                    or (p.sel_id in self._id_only and p.tag is None and not p.classes and not p.attrs)
                    or (len(p.classes) == 1 and p.classes[0] in self._class_only
                        and p.tag is None and p.sel_id is None and not p.attrs)
                )
            ]
        )

    def matches(self, el: Element) -> bool:
        if el.tag in self._tag_only:
            return True
        if self._id_only and el.attr("id") in self._id_only:
            return True
        if self._class_only and not self._class_only.isdisjoint(el.classes()):
            return True
        return any(p.matches(el) for p in self._rest)
