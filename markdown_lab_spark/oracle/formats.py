"""Output-format decoration (M4): ports of markdown_lab/formats/*.py.

The reference stamps wall-clock timestamps (nondeterministic — excluded
from its own test assertions); here ``generated_at`` is injectable so the
engine stays deterministic. Parity target remains the RAW conversion
output (M1-M3); decoration is an optional post-step, exactly as in the
reference (markdown_lab/core/converter.py:102-112).
"""

from __future__ import annotations

import json
from typing import Optional

from .markdown_converter import Document, document_to_json, document_to_markdown


def decorate_markdown(markdown: str, title: str, source_url: str, generated_at: str = "") -> str:
    """Port of markdown_lab/formats/markdown.py:13-45: prepend metadata
    header ``# {title}`` + source + generated lines."""
    header = f"# {title}\n\n*Source: {source_url}*\n*Generated: {generated_at}*\n\n"
    return header + markdown


def decorate_json(doc_json: str, source_url: str, generated_at: str = "") -> str:
    """Port of markdown_lab/formats/json.py:14-55: inject a metadata object
    and re-dump with indent=2, ensure_ascii=False."""
    obj = json.loads(doc_json)
    obj["metadata"] = {"source_url": source_url, "generated_at": generated_at}
    return json.dumps(obj, indent=2, ensure_ascii=False)


def decorate_xml(doc_xml: str, source_url: str, generated_at: str = "") -> str:
    """Port of markdown_lab/formats/xml.py:15-95: append a <metadata>
    element before the closing root tag (minidom pretty-print omitted; the
    reference strips its blank lines anyway)."""
    meta = (
        f"<metadata><source_url>{_esc(source_url)}</source_url>"
        f"<generated_at>{_esc(generated_at)}</generated_at></metadata>"
    )
    if doc_xml.endswith("</Document>"):
        return doc_xml[: -len("</Document>")] + meta + "</Document>"
    return doc_xml + meta


def _esc(text: str) -> str:
    return text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def convert_with_metadata(
    doc: Document, output_format: str, source_url: str, generated_at: str = ""
) -> str:
    if output_format == "markdown":
        return decorate_markdown(
            document_to_markdown(doc), doc.title, source_url, generated_at
        )
    if output_format == "json":
        return decorate_json(document_to_json(doc), source_url, generated_at)
    if output_format == "xml":
        from .markdown_converter import document_to_xml

        return decorate_xml(document_to_xml(doc), source_url, generated_at)
    raise ValueError(output_format)
