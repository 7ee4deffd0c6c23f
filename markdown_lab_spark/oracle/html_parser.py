"""HTML parsing operators: semantic ports of src/html_parser.rs.

Every function is a line-for-line behavioral port; the quirks are
intentional parity (e.g. clean_html's serialize-then-string-replace
removal, src/html_parser.rs:104-126, can miss elements whose serialized
form differs from the full-document serialization — since we serialize
with the same code both times, the miss only occurs for duplicated
substrings, exactly as in the reference).
"""

from __future__ import annotations

from typing import List

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


def clean_parsed_detached(document: HtmlDocument):
    """Tree-level clean, VERIFIED against the string-replace contract.

    Returns ``(cleaned_html, ok, restore)``: the string-replace result
    (always authoritative), whether the mutated tree is byte-equivalent
    to re-parsing it, and a function that reattaches the detached
    elements (callers share the tree with link extraction, which must see
    the original document).

    ``ok`` is True only when serialize(tree-after-removal) equals the
    string-replace output AND no raw-text elements remain (the one
    serializer round-trip hazard) — then ``parse(cleaned_html)`` is
    provably the mutated tree itself and the caller skips the second
    parse, the conversion hot path's single biggest cost. Duplicated
    substrings (the reference's removal quirk, src/html_parser.rs:110-121)
    make the serializations diverge and fall back to the re-parse.
    """
    from .htmldom import RAW_TEXT_ELEMENTS  # noqa: PLC0415

    root = document.root_element()
    matched = list(document.select(SEL_UNWANTED))
    elements_to_remove = [el.html() for el in matched]
    cleaned_html = root.html()
    for element_html in elements_to_remove:
        cleaned_html = cleaned_html.replace(element_html, "")

    slots = []
    ok = True
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

    if ok:
        ok = all(el.tag not in RAW_TEXT_ELEMENTS for el in root.iter_elements())
    if ok:
        ok = root.html() == cleaned_html
    return cleaned_html, ok, restore


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
