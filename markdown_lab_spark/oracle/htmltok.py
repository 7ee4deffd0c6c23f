"""Fast tokenizer for COMPLETE HTML documents.

Produces the exact handler-call sequence of
``html.parser.HTMLParser(convert_charrefs=True).feed(data); close()`` on a
complete (non-streaming) input — pinned by a differential fuzz suite —
while dropping what the stdlib's streaming design pays per token:
updatepos line/col bookkeeping, incremental-buffer suspension checks
(`check_for_whole_start_tag`'s buffer-boundary branches become plain
error recovery), per-chunk charref-boundary heuristics, and rawdata
re-slicing. The stdlib's own compiled tolerant regexes are reused so
tag/attr/comment/end-tag matching is bit-identical; with
convert_charrefs=True the entityref/charref dispatch branches are
unreachable (the scanner jumps straight to '<'), so they are omitted.

This is the engine's analogue of the reference swapping html.parser for
a compiled tokenizer: the tree builder (htmldom._TreeBuilder) is
unchanged, only the token source is faster.
"""

from __future__ import annotations

import re

import _markupbase
from html import unescape
from html.parser import (
    attrfind_tolerant,
    endendtag,
    endtagfind,
    piclose,
    starttagopen,
    tagfind_tolerant,
    locatestarttagend_tolerant,
)

_markedsectionclose = _markupbase._markedsectionclose
_msmarkedsectionclose = _markupbase._msmarkedsectionclose
_declname_match = _markupbase._declname_match
_commentclose = re.compile(r"--\s*>")

CDATA_CONTENT_ELEMENTS = ("script", "style")
_ATTR_END_CHARS = "abcdefghijklmnopqrstuvwxyz=/ABCDEFGHIJKLMNOPQRSTUVWXYZ"

_cdata_close_cache = {}


def _cdata_close(elem: str):
    rx = _cdata_close_cache.get(elem)
    if rx is None:
        rx = _cdata_close_cache[elem] = re.compile(r"</\s*%s\s*>" % elem, re.I)
    return rx


def _check_for_whole_start_tag(data: str, i: int) -> int:
    """HTMLParser.check_for_whole_start_tag, verbatim semantics."""
    m = locatestarttagend_tolerant.match(data, i)
    if m:
        j = m.end()
        nxt = data[j : j + 1]
        if nxt == ">":
            return j + 1
        if nxt == "/":
            if data.startswith("/>", j):
                return j + 2
            # "/" at end of input: stdlib waits for more; complete input
            # means error recovery
            return -1
        if nxt == "":
            return -1
        if nxt in _ATTR_END_CHARS:
            return -1
        return j if j > i else i + 1
    raise AssertionError("locatestarttagend_tolerant cannot fail to match")


# fast path for the overwhelmingly common start-tag shapes: a plain tag
# (<p>, <br/>) or space-separated double-quoted attributes without '&'
# (no entity decoding needed). Whenever this matches, the stdlib-tolerant
# slow path below provably produces the same (tag, attrs, endpos), so the
# handler-call sequence is unchanged (pinned by the differential fuzz).
_fast_start = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9]*)"
    r'((?:\s+[a-zA-Z_:][-a-zA-Z0-9_:.]*\s*=\s*"[^"&]*")*)'
    r"\s*(/?)>"
)
_fast_attr = re.compile(r'([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*=\s*"([^"&]*)"')


def _parse_starttag(data: str, i: int, h):
    """Returns (next_pos, cdata_elem_or_None)."""
    m = _fast_start.match(data, i)
    if m:
        tag = m.group(1).lower()
        raw_attrs = m.group(2)
        if raw_attrs:
            attrs = [
                (name.lower(), value)
                for name, value in _fast_attr.findall(raw_attrs)
            ]
        else:
            attrs = []
        if m.group(3):
            h.handle_startendtag(tag, attrs)
            return m.end(), None
        h.handle_starttag(tag, attrs)
        return m.end(), tag if tag in CDATA_CONTENT_ELEMENTS else None
    endpos = _check_for_whole_start_tag(data, i)
    if endpos < 0:
        return endpos, None
    attrs = []
    match = tagfind_tolerant.match(data, i + 1)
    assert match, "starttagopen matched but tagfind did not"
    k = match.end()
    tag = match.group(1).lower()
    while k < endpos:
        m = attrfind_tolerant.match(data, k)
        if not m:
            break
        attrname, rest, attrvalue = m.group(1, 2, 3)
        if not rest:
            attrvalue = None
        elif (
            attrvalue[:1] == "'" == attrvalue[-1:]
            or attrvalue[:1] == '"' == attrvalue[-1:]
        ):
            attrvalue = attrvalue[1:-1]
        if attrvalue:
            attrvalue = unescape(attrvalue)
        attrs.append((attrname.lower(), attrvalue))
        k = m.end()

    end = data[k:endpos].strip()
    if end not in (">", "/>"):
        h.handle_data(data[i:endpos])
        return endpos, None
    if end.endswith("/>"):
        h.handle_startendtag(tag, attrs)
        return endpos, None
    h.handle_starttag(tag, attrs)
    return endpos, tag if tag in CDATA_CONTENT_ELEMENTS else None


def _parse_bogus_comment(data: str, i: int, h) -> int:
    pos = data.find(">", i + 2)
    if pos == -1:
        return -1
    h.handle_comment(data[i + 2 : pos])
    return pos + 1


# fast path for the plain </tag> shape (no spaces, ASCII name): whenever
# it matches, the tolerant slow path below yields the same (elem, gtpos)
_fast_end = re.compile(r"</([a-zA-Z][a-zA-Z0-9]*)>")


def _parse_endtag(data: str, i: int, h, cdata_elem):
    """Returns (next_pos, new_cdata_elem)."""
    m = _fast_end.match(data, i)
    if m:
        elem = m.group(1).lower()
        if cdata_elem is not None and elem != cdata_elem:
            h.handle_data(data[i : m.end()])
            return m.end(), cdata_elem
        h.handle_endtag(elem)
        return m.end(), None
    match = endendtag.search(data, i + 1)  # >
    if not match:
        return -1, cdata_elem
    gtpos = match.end()
    match = endtagfind.match(data, i)  # </ + tag + >
    if not match:
        if cdata_elem is not None:
            h.handle_data(data[i:gtpos])
            return gtpos, cdata_elem
        namematch = tagfind_tolerant.match(data, i + 2)
        if not namematch:
            if data[i : i + 3] == "</>":
                return i + 3, cdata_elem
            return _parse_bogus_comment(data, i, h), cdata_elem
        tagname = namematch.group(1).lower()
        gtpos = data.find(">", namematch.end())
        h.handle_endtag(tagname)
        return gtpos + 1, cdata_elem

    elem = match.group(1).lower()
    if cdata_elem is not None and elem != cdata_elem:
        h.handle_data(data[i:gtpos])
        return gtpos, cdata_elem
    h.handle_endtag(elem)
    return gtpos, None


def _parse_comment(data: str, i: int, h) -> int:
    match = _commentclose.search(data, i + 4)
    if not match:
        return -1
    h.handle_comment(data[i + 4 : match.start(0)])
    return match.end(0)


def _parse_pi(data: str, i: int, h) -> int:
    match = piclose.search(data, i + 2)  # >
    if not match:
        return -1
    h.handle_pi(data[i + 2 : match.start()])
    return match.end()


def _scan_name(data: str, i: int):
    """_markupbase._scan_name semantics (raises on non-name like stdlib)."""
    n = len(data)
    if i == n:
        return None, -1
    m = _declname_match(data, i)
    if m:
        s = m.group()
        if (i + len(s)) == n:
            return None, -1
        return s.strip().lower(), m.end()
    raise AssertionError("expected name token in declaration")


def _parse_marked_section(data: str, i: int, h) -> int:
    sect_name, j = _scan_name(data, i + 3)
    if j < 0:
        return j
    if sect_name in {"temp", "cdata", "ignore", "include", "rcdata"}:
        match = _markedsectionclose.search(data, i + 3)
    elif sect_name in {"if", "else", "endif"}:
        match = _msmarkedsectionclose.search(data, i + 3)
    else:
        raise AssertionError(
            "unknown status keyword %r in marked section" % data[i + 3 : j]
        )
    if not match:
        return -1
    h.unknown_decl(data[i + 3 : match.start(0)])
    return match.end(0)


def _parse_html_declaration(data: str, i: int, h) -> int:
    if data[i : i + 4] == "<!--":
        return _parse_comment(data, i, h)
    if data[i : i + 3] == "<![":
        return _parse_marked_section(data, i, h)
    if data[i : i + 9].lower() == "<!doctype":
        gtpos = data.find(">", i + 9)
        if gtpos == -1:
            return -1
        h.handle_decl(data[i + 2 : gtpos])
        return gtpos + 1
    return _parse_bogus_comment(data, i, h)


def tokenize(data: str, h) -> None:
    """Drive handler ``h`` over complete document ``data``."""
    n = len(data)
    i = 0
    cdata_elem = None
    while i < n:
        if cdata_elem is None:
            j = data.find("<", i)
            if j < 0:
                j = n
            if i < j:
                h.handle_data(unescape(data[i:j]))
        else:
            m = _cdata_close(cdata_elem).search(data, i)
            if not m:
                return  # trailing cdata text dropped (stdlib parity)
            j = m.start()
            if i < j:
                h.handle_data(data[i:j])
        i = j
        if i == n:
            return

        k = -1
        if starttagopen.match(data, i):  # < + letter
            k, new_cdata = _parse_starttag(data, i, h)
            if k >= 0:
                cdata_elem = new_cdata or cdata_elem
        elif data.startswith("</", i):
            k, cdata_elem = _parse_endtag(data, i, h, cdata_elem)
        elif data.startswith("<!--", i):
            k = _parse_comment(data, i, h)
        elif data.startswith("<?", i):
            k = _parse_pi(data, i, h)
        elif data.startswith("<!", i):
            k = _parse_html_declaration(data, i, h)
        elif i + 1 < n:
            h.handle_data("<")
            k = i + 1
        else:
            break  # lone '<' at EOF: emitted below

        if k < 0:
            # complete-input error recovery (goahead's end=True branch)
            k = data.find(">", i + 1)
            if k < 0:
                k = data.find("<", i + 1)
                if k < 0:
                    k = i + 1
            else:
                k += 1
            if cdata_elem is None:
                h.handle_data(unescape(data[i:k]))
            else:
                h.handle_data(data[i:k])
        i = k

    if i < n and cdata_elem is None:
        h.handle_data(unescape(data[i:n]))
