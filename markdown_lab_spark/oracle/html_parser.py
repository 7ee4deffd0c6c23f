"""HTML parsing operators: semantic ports of src/html_parser.rs.

Every function is a line-for-line behavioral port; the quirks are
intentional parity (e.g. clean_html's serialize-then-string-replace
removal, src/html_parser.rs:104-126, can miss elements whose serialized
form differs from the full-document serialization — since we serialize
with the same code both times, the miss only occurs for duplicated
substrings, exactly as in the reference).
"""

from __future__ import annotations

import re
from typing import List, Optional

from .htmldom import Element, HtmlDocument, Selector, parse_document  # noqa: F401 (parse_document re-exported for UDF hot path)
from .url_utils import url_join

# src/html_parser.rs:26 — content container selectors
SEL_MAIN_CONTENT = Selector("main, article, #content, .content")
# src/html_parser.rs:31-37 — unwanted element selectors
SEL_UNWANTED = Selector(
    "script, style, iframe, noscript, .advertisement, .ad, .banner, "
    "#cookie-notice, header, footer, nav, .sidebar, .menu, .comments, "
    ".related, .share, .social"
)
SEL_LINKS = Selector("a[href]")
_FALLBACKS = [Selector(s) for s in ("main", "article", "#content", ".content", "body")]


def extract_main_content(html: str) -> HtmlDocument:
    """Port of src/html_parser.rs:63-86."""
    document = parse_document(html)
    for el in document.select(SEL_MAIN_CONTENT):
        return parse_document(el.html())
    for sel in _FALLBACKS:
        for el in document.select(sel):
            return parse_document(el.html())
    return document


def clean_html(html: str) -> str:
    """Port of src/html_parser.rs:104-126 (string-replace removal quirk)."""
    return clean_parsed(parse_document(html))


def clean_parsed(document: HtmlDocument) -> str:
    """clean_html on an already-parsed tree (src/html_parser.rs:143-164).

    Semantically identical to ``clean_html(document.root_element().html())``
    because the serializer/parser round-trip is stable (asserted in tests);
    saves one full parse per document in the hot path.
    """
    elements_to_remove: List[str] = [el.html() for el in document.select(SEL_UNWANTED)]
    cleaned_html = document.root_element().html()
    for element_html in elements_to_remove:
        cleaned_html = cleaned_html.replace(element_html, "")
    return cleaned_html


def clean_parsed_detached(document: HtmlDocument, matched=None, has_raw=True):
    """Tree-level clean, VERIFIED against the string-replace contract.

    ``matched``/``has_raw`` let the caller pass the results of its own
    traversal (``matched`` must be the SEL_UNWANTED matches in document
    pre-order, root first; ``has_raw=False`` asserts the full tree holds
    no raw-text element, letting the round-trip check be skipped).

    Returns ``(cleaned_html, ok, restore)``: the string-replace result
    (always authoritative), whether the mutated tree is byte-equivalent
    to re-parsing it, and a function that reattaches the detached
    elements (callers share the tree with link extraction, which must see
    the original document).

    ``ok`` is True only when the removal is PROVABLY span-exact — then
    ``parse(cleaned_html)`` is provably the mutated tree itself and the
    caller skips the second parse, the conversion hot path's single
    biggest cost. The proof, with NO second full serialization (the old
    verifier's cost): serialization is compositional, so the mutated
    tree's serialization is exactly the full serialization with the
    TOP-LEVEL matched elements' spans spliced out (nested matched
    elements sit inside a removed ancestor's span). Those spans are
    recorded during the one serialization (serialize_with_spans); the
    splice is pure C-level slicing, and ``cleaned_html == splice`` is a
    memcmp. Duplicated substrings (the reference's removal quirk,
    src/html_parser.rs:110-121) or seam artifacts make the two strings
    differ and fall back to the authoritative re-parse; raw-text
    elements remaining in the mutated tree (the one serializer
    round-trip hazard) also force the fallback.
    """
    from .htmldom import RAW_TEXT_ELEMENTS, serialize_with_spans  # noqa: PLC0415

    root = document.root_element()
    if matched is None:
        matched = list(document.select(SEL_UNWANTED))
    matched_ids = {id(el) for el in matched}
    top_level = [
        el
        for el in matched
        if not _has_matched_ancestor(el, matched_ids)
    ]
    full_html, spans = serialize_with_spans(root, {id(el) for el in top_level})
    cleaned_html = full_html
    for el in matched:
        # el.html() == full_html[span] for top-level; nested still need
        # their own serialization for the replace contract
        s = spans.get(id(el))
        element_html = full_html[s[0] : s[1]] if s is not None else el.html()
        cleaned_html = cleaned_html.replace(element_html, "")

    slots = []
    ok = len(spans) == len(top_level) and id(root) not in matched_ids
    for el in matched:
        parent = el.parent
        if parent is None:
            ok = False
            break
        try:
            idx = parent.children.index(el)
        except ValueError:
            ok = False
            break
        slots.append((parent, idx, el))
        parent.children.pop(idx)

    def restore() -> None:
        for parent, idx, el in reversed(slots):
            parent.children.insert(idx, el)

    if ok:  # span splice must equal the string-replace result (memcmp)
        pieces = []
        prev = 0
        for start, end in sorted(spans.values()):
            pieces.append(full_html[prev:start])
            prev = end
        pieces.append(full_html[prev:])
        ok = "".join(pieces) == cleaned_html
    if ok and has_raw:  # round-trip safety (skip when caller proved none)
        ok = all(el.tag not in RAW_TEXT_ELEMENTS for el in root.iter_elements())
    return cleaned_html, ok, restore


def _has_matched_ancestor(el: Element, matched_ids) -> bool:
    node = el.parent
    while node is not None:
        if id(node) in matched_ids:
            return True
        node = node.parent
    return False


def extract_links(html: str, base_url: str) -> List[str]:
    """Port of src/html_parser.rs:214-252.

    Absolute http(s) hrefs pass through verbatim; relative hrefs are
    RFC-joined; javascript:/#/empty skipped; result is lexicographically
    sorted + deduped (sort_unstable+dedup, src/html_parser.rs:247-251) —
    this ordering defines the reference's per-page link-discovery order
    and therefore the engine's frontier ordering.
    """
    return extract_links_parsed(parse_document(html), base_url)


def extract_links_parsed(document: HtmlDocument, base_url: str) -> List[str]:
    """extract_links on an already-parsed tree (hot-path variant)."""
    links: List[str] = []
    for element in document.select(SEL_LINKS):
        href = element.attr("href")
        if href is None:
            continue
        if href.startswith("javascript:") or href.startswith("#") or href == "":
            continue
        if href.startswith("http://") or href.startswith("https://"):
            processed = href
        else:
            joined = url_join(base_url, href)
            if joined is None:
                continue
            processed = joined
        links.append(processed)
    links.sort()
    out: List[str] = []
    for link in links:
        if not out or out[-1] != link:
            out.append(link)
    return out


def get_element_text(element: Element) -> str:
    """Port of src/html_parser.rs:293-301."""
    return element.text_joined()


SEL_CANONICAL = Selector("link[href]")


def extract_canonical(html: str, base_url: str) -> Optional[str]:
    """First ``<link rel=canonical href=..>`` in document order (the
    first-wins handling search engines document), resolved absolute
    against ``base_url``; None when absent, unresolvable, or not
    http(s). ``rel`` is matched as a space-separated token list,
    case-insensitive (HTML's rel attribute is a token set). The
    reference parser extracts only ``a[href]`` — rel=canonical is the
    standard crawl-pipeline dedup signal layered on top."""
    return extract_canonical_parsed(parse_document(html), base_url)


def extract_canonical_parsed(
    document: HtmlDocument, base_url: str
) -> Optional[str]:
    """extract_canonical on an already-parsed tree (hot-path variant,
    shares the parse with link extraction)."""
    for element in document.select(SEL_CANONICAL):
        if element.tag != "link":
            continue
        rel = (element.attr("rel") or "").lower().split()
        if "canonical" not in rel:
            continue
        href = (element.attr("href") or "").strip()
        if not href:
            continue
        if href.startswith("http://") or href.startswith("https://"):
            return href
        if re.match(r"^[a-zA-Z][a-zA-Z0-9+.\-]*:", href):
            return None  # non-http(s) scheme (ftp:, mailto:, data:, ...)
        return url_join(base_url, href)
    return None


def extract_links_with_anchors(
    html: str, base_url: str
) -> List[tuple]:
    """(resolved_url, anchor_text) for every <a href> occurrence, same
    resolution/skip regime as extract_links but WITHOUT the sort+dedup:
    anchor aggregation wants every occurrence (frequency is the
    signal). Anchor text is the element's whitespace-normalized text,
    capped at 256 chars to bound row width."""
    document = parse_document(html)
    out: List[tuple] = []
    for element in document.select(SEL_LINKS):
        href = element.attr("href")
        if href is None:
            continue
        if href.startswith("javascript:") or href.startswith("#") or href == "":
            continue
        if href.startswith("http://") or href.startswith("https://"):
            processed = href
        else:
            joined = url_join(base_url, href)
            if joined is None:
                continue
            processed = joined
        anchor = " ".join(get_element_text(element).split())[:256]
        out.append((processed, anchor))
    return out


_META_REFRESH_RE = re.compile(
    r"""^\s*\d+(?:\.\d*)?\s*[;,]\s*(?:url\s*=\s*)?['"]?\s*([^'">\s]+)""",
    re.IGNORECASE,
)


def extract_meta_refresh(html: str, base_url: str) -> Optional[str]:
    """Target of the first ``<meta http-equiv=refresh content="N; url=..">``
    (the client-side redirect real sites use and ``requests`` does NOT
    follow — a crawler that ignores it records shell pages). Content is
    parsed WHATWG-style (delay, ``;``/``,`` separator, optional
    ``url=`` and quotes); the target resolves like link hrefs: absolute
    http(s) pass through, relative joins ``base_url``, any other scheme
    is rejected. None when absent or malformed."""
    document = parse_document(html)
    for element in document.select(SEL_META_REFRESH):
        if element.tag != "meta":
            continue
        if (element.attr("http-equiv") or "").strip().lower() != "refresh":
            continue
        content = element.attr("content") or ""
        m = _META_REFRESH_RE.match(content)
        if not m:
            continue
        href = m.group(1).strip()
        if not href:
            continue
        if href.startswith("http://") or href.startswith("https://"):
            return href
        if re.match(r"^[a-zA-Z][a-zA-Z0-9+.\-]*:", href):
            return None
        return url_join(base_url, href)
    return None


SEL_META_REFRESH = Selector("meta[content]")
