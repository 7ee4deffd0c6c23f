"""HTML -> Document -> Markdown/JSON/XML: semantic port of src/markdown_converter.rs.

``document_to_markdown`` (src/markdown_converter.rs:326-388) is the
byte-identity contract of the whole engine: output emitted in STRUCT order
(title, headings, paragraphs, links, images, lists, code blocks,
blockquotes), then the exact newline-collapse + trim.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import List, Optional

from .html_parser import clean_html
from .htmldom import HtmlDocument, Selector, parse_document
from .url_utils import resolve_url_against_base


@dataclass
class Heading:
    level: int
    text: str


@dataclass
class Link:
    text: str
    url: str


@dataclass
class Image:
    alt: str
    src: str


@dataclass
class ListBlock:
    ordered: bool
    items: List[str]


@dataclass
class CodeBlock:
    language: str
    code: str


@dataclass
class Document:
    """Port of the Document struct (src/markdown_converter.rs:32-43)."""

    title: str = ""
    base_url: str = ""
    headings: List[Heading] = field(default_factory=list)
    paragraphs: List[str] = field(default_factory=list)
    links: List[Link] = field(default_factory=list)
    images: List[Image] = field(default_factory=list)
    lists: List[ListBlock] = field(default_factory=list)
    code_blocks: List[CodeBlock] = field(default_factory=list)
    blockquotes: List[str] = field(default_factory=list)


_SEL_TITLE = Selector("title")
_SEL_HEADINGS = [Selector(f"h{i}") for i in range(1, 7)]
_SEL_P = Selector("p")
_SEL_A = Selector("a[href]")
_SEL_IMG = Selector("img[src]")
_SEL_UL = Selector("ul")
_SEL_OL = Selector("ol")
_SEL_LI = Selector("li")
_SEL_PRE_CODE = Selector("pre, code")
_SEL_BLOCKQUOTE = Selector("blockquote")


def parse_html_to_document(html: str, base_url: str) -> Document:
    """Port of src/markdown_converter.rs:76-94.

    parse (entities decoded) -> clean (serialize + string-replace) ->
    re-parse -> extract. The reference serializes and re-parses between the
    first two steps (src/markdown_converter.rs:82-86); ``clean_parsed`` is
    equivalent because the serializer/parser round-trip is stable.
    """
    return parse_tree_to_document(parse_document(html), base_url)


def parse_tree_to_document(document_html, base_url: str) -> Document:
    """Hot-path variant taking an already-parsed tree (shared with
    link extraction in the Spark UDF: one parse per page).

    Fast path: when nothing matches the unwanted-element selectors,
    clean_html reduces to the serializer/parser round-trip, which is
    identity on a tree holding no raw-text elements (stability asserted
    in tests) — so the serialize + re-parse is skipped entirely. Any
    unwanted match or raw-text element (script/style/iframe/... serialize
    unescaped and are the one round-trip hazard) takes the reference's
    full clean path."""
    from .html_parser import SEL_UNWANTED, clean_parsed_detached
    from .htmldom import RAW_TEXT_ELEMENTS

    # ONE traversal finds both the unwanted matches and any raw-text
    # element (round-trip hazard); the clean path reuses the match list
    root = document_html.root_element()
    matched = [root] if SEL_UNWANTED.matches(root) else []
    has_raw = False
    for el in root.iter_elements():
        if el.tag in RAW_TEXT_ELEMENTS:
            has_raw = True
        if SEL_UNWANTED.matches(el):
            matched.append(el)
    if not matched and not has_raw:
        return _extract(document_html, base_url)

    # slow path: something to remove. clean_parsed_detached verifies that
    # tree-level removal is byte-equivalent to the string-replace contract
    # — when it is, the second parse (the hot path's biggest cost) is
    # skipped and extraction runs on the mutated tree, restored afterwards
    # (the caller shares this tree with link extraction).
    cleaned_html, tree_ok, restore = clean_parsed_detached(
        document_html, matched=matched, has_raw=has_raw
    )
    if tree_ok:
        try:
            return _extract(document_html, base_url)
        finally:
            restore()
    restore()
    return _extract(parse_document(cleaned_html), base_url)


def _extract(cleaned, base_url: str) -> Document:
    title = _extract_title(cleaned)
    doc = Document(title=title, base_url=base_url)
    _populate(doc, cleaned, base_url)
    return doc


def _extract_title(document: HtmlDocument) -> str:
    """Port of src/markdown_converter.rs:97-106."""
    for el in document.select(_SEL_TITLE):
        return el.text().strip()
    return "No Title"


_POPULATE_TAGS = frozenset(
    ["h1", "h2", "h3", "h4", "h5", "h6", "p", "a", "img", "ul", "ol",
     "pre", "code", "blockquote"]
)


def _populate(doc: Document, document_html: HtmlDocument, base_url: str) -> None:
    """Port of src/markdown_converter.rs:124-279 (struct order).

    One pre-order traversal builds a tag index; per-tag iteration then
    preserves document order exactly as repeated ``select`` calls would
    (selectors here are all tag-shaped), without 13 full-tree scans.
    """
    by_tag: dict = {t: [] for t in _POPULATE_TAGS}
    root = document_html.root_element()  # always the implied <html>
    for el in root.iter_elements():
        if el.tag in _POPULATE_TAGS:
            by_tag[el.tag].append(el)

    # headings h1..h6 — grouped by LEVEL, not document position
    for level in range(1, 7):
        for el in by_tag[f"h{level}"]:
            text = el.text().strip()
            if text:
                doc.headings.append(Heading(level=level, text=text))

    for el in by_tag["p"]:
        text = el.text().strip()
        if text:
            doc.paragraphs.append(text)

    for el in by_tag["a"]:
        href = el.attr("href")
        if href is None:
            continue
        text = el.text().strip()
        if text:
            absolute = resolve_url_against_base(base_url, href)
            if absolute is not None:
                doc.links.append(Link(text=text, url=absolute))

    for el in by_tag["img"]:
        src = el.attr("src")
        if src is None:
            continue
        alt = el.attr("alt")
        alt = alt if alt is not None else "image"
        absolute = resolve_url_against_base(base_url, src)
        if absolute is not None:
            doc.images.append(Image(alt=alt, src=absolute))

    # unordered lists, then ordered lists (src/markdown_converter.rs:219-242)
    for el in by_tag["ul"]:
        items = [li.text().strip() for li in el.select(_SEL_LI)]
        items = [i for i in items if i]
        if items:
            doc.lists.append(ListBlock(ordered=False, items=items))
    for el in by_tag["ol"]:
        items = [li.text().strip() for li in el.select(_SEL_LI)]
        items = [i for i in items if i]
        if items:
            doc.lists.append(ListBlock(ordered=True, items=items))

    # "pre, code" — document-order merge of both tags; a code inside pre
    # matches BOTH and is emitted twice (parity,
    # src/markdown_converter.rs:245-266)
    for el in _iter_pre_code(document_html):
        text = el.text().strip()
        if text:
            lang = ""
            for cls in el.classes():
                if cls.startswith("language-"):
                    lang = cls[len("language-") :]
                    break
            doc.code_blocks.append(CodeBlock(language=lang, code=text))

    for el in by_tag["blockquote"]:
        text = el.text().strip()
        if text:
            doc.blockquotes.append(text)


def _iter_pre_code(document_html: HtmlDocument):
    """'pre, code' in document order (one traversal)."""
    root = document_html.root_element()
    if root.tag in ("pre", "code"):
        yield root
    for el in root.iter_elements():
        if el.tag in ("pre", "code"):
            yield el


def document_to_markdown(document: Document) -> str:
    """Port of src/markdown_converter.rs:326-388 — THE byte-identity contract."""
    parts: List[str] = [f"# {document.title}\n\n"]

    for heading in document.headings:
        parts.append(f"{'#' * heading.level} {heading.text}\n\n")

    for paragraph in document.paragraphs:
        parts.append(f"{paragraph}\n\n")

    for link in document.links:
        parts.append(f"[{link.text}]({link.url})\n\n")

    for image in document.images:
        parts.append(f"![{image.alt}]({image.src})\n\n")

    for lst in document.lists:
        if lst.ordered:
            for i, item in enumerate(lst.items):
                parts.append(f"{i + 1}. {item}\n")
        else:
            for item in lst.items:
                parts.append(f"- {item}\n")
        parts.append("\n")

    for cb in document.code_blocks:
        parts.append(f"```{cb.language}\n{cb.code}\n```\n\n")

    for bq in document.blockquotes:
        quoted = "\n".join(f"> {line}" for line in bq.splitlines())
        parts.append(f"{quoted}\n\n")

    markdown_content = "".join(parts)
    return (
        markdown_content.replace("\n\n\n\n", "\n\n").replace("\n\n\n", "\n\n").strip()
    )


def document_to_json(document: Document) -> str:
    """Port of src/markdown_converter.rs:391-395 (serde_json pretty)."""
    obj = {
        "title": document.title,
        "base_url": document.base_url,
        "headings": [{"level": h.level, "text": h.text} for h in document.headings],
        "paragraphs": list(document.paragraphs),
        "links": [{"text": l.text, "url": l.url} for l in document.links],
        "images": [{"alt": i.alt, "src": i.src} for i in document.images],
        "lists": [{"ordered": l.ordered, "items": list(l.items)} for l in document.lists],
        "code_blocks": [
            {"language": c.language, "code": c.code} for c in document.code_blocks
        ],
        "blockquotes": list(document.blockquotes),
    }
    return json.dumps(obj, indent=2, ensure_ascii=False)


def _xml_escape(text: str) -> str:
    return text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def document_to_xml(document: Document) -> str:
    """Port of src/markdown_converter.rs:398-411 (quick_xml::se::to_string).

    Element-per-field, repeated elements for Vec items, no declaration,
    no pretty-printing.
    """
    out: List[str] = ["<Document>"]
    out.append(f"<title>{_xml_escape(document.title)}</title>")
    out.append(f"<base_url>{_xml_escape(document.base_url)}</base_url>")
    for h in document.headings:
        out.append(
            f"<headings><level>{h.level}</level>"
            f"<text>{_xml_escape(h.text)}</text></headings>"
        )
    for p in document.paragraphs:
        out.append(f"<paragraphs>{_xml_escape(p)}</paragraphs>")
    for l in document.links:
        out.append(
            f"<links><text>{_xml_escape(l.text)}</text>"
            f"<url>{_xml_escape(l.url)}</url></links>"
        )
    for i in document.images:
        out.append(
            f"<images><alt>{_xml_escape(i.alt)}</alt>"
            f"<src>{_xml_escape(i.src)}</src></images>"
        )
    for lst in document.lists:
        items = "".join(f"<items>{_xml_escape(it)}</items>" for it in lst.items)
        out.append(
            f"<lists><ordered>{'true' if lst.ordered else 'false'}</ordered>{items}</lists>"
        )
    for c in document.code_blocks:
        out.append(
            f"<code_blocks><language>{_xml_escape(c.language)}</language>"
            f"<code>{_xml_escape(c.code)}</code></code_blocks>"
        )
    for b in document.blockquotes:
        out.append(f"<blockquotes>{_xml_escape(b)}</blockquotes>")
    out.append("</Document>")
    return "".join(out)


def convert_html(html: str, base_url: str, output_format: str = "markdown") -> str:
    """Port of src/markdown_converter.rs:414-426."""
    document = parse_html_to_document(html, base_url)
    if output_format == "markdown":
        return document_to_markdown(document)
    if output_format == "json":
        return document_to_json(document)
    if output_format == "xml":
        return document_to_xml(document)
    raise ValueError(f"unknown format: {output_format}")


def convert_to_markdown(html: str, base_url: str) -> str:
    return convert_html(html, base_url, "markdown")
