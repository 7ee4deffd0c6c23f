"""Pure-Python semantics oracle for the markdown_lab reference.

These modules are line-for-line behavioral ports of the reference's Rust
core (src/markdown_converter.rs, src/html_parser.rs, src/chunker.rs) and
Python utils. They are the byte-identity contract: the Spark UDFs call
EXACTLY these functions, so the Arrow path is tested end-to-end against
the same semantics the pytest suite freezes.
"""

from .chunker import chunk_markdown, create_semantic_chunks as chunk_markdown_rust
from .chunk_utils import create_semantic_chunks
from .html_parser import clean_html, extract_links, extract_main_content
from .markdown_converter import (
    Document,
    convert_html,
    convert_to_markdown,
    document_to_json,
    document_to_markdown,
    document_to_xml,
    parse_html_to_document,
)
from .url_utils import (
    extract_base_url,
    get_domain_from_url,
    get_filename_from_url,
    normalize_url,
    validate_url,
)

__all__ = [
    "Document",
    "chunk_markdown",
    "chunk_markdown_rust",
    "clean_html",
    "convert_html",
    "convert_to_markdown",
    "create_semantic_chunks",
    "document_to_json",
    "document_to_markdown",
    "document_to_xml",
    "extract_base_url",
    "extract_links",
    "extract_main_content",
    "get_domain_from_url",
    "get_filename_from_url",
    "normalize_url",
    "parse_html_to_document",
    "validate_url",
]
