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
