"""RAG chunker: semantic port of src/chunker.rs (the parity target).

Byte-exact notes:
- Rust ``String::len``/``split_at``/``find_good_split_point`` operate on
  UTF-8 BYTE offsets (src/chunker.rs:121-136,185-215); this port does the
  same by running the split-point search over the UTF-8 encoding.
- ``str::lines`` drops a trailing empty line and strips a trailing ``\r``;
  replicated in ``_lines``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List, Optional

# src/chunker.rs:7-31 — pre-compiled patterns (byte equivalents)
_PARAGRAPH_BOUNDARY = re.compile(rb"\n\s*\n")
_SENTENCE_BOUNDARY = re.compile(rb"[.!?]\s+")
_HEADING_RE = re.compile(r"^(#{1,6})\s+(.+)$")
_SEMANTIC_PATTERNS = re.compile(
    r"(?i)\b(function|class|method|algorithm|process|system|data|model|"
    r"analysis|implementation)\b"
)
_UPPERCASE_WORD = re.compile(r"\b[A-Z][a-z]+")
_NUMERIC_PATTERN = re.compile(r"\b\w*\d+\w*\b")


@dataclass
class ChunkMetadata:
    heading: Optional[str]
    level: int
    position: int
    word_count: int
    char_count: int
    semantic_density: float


@dataclass
class Chunk:
    content: str
    metadata: ChunkMetadata


def _lines(markdown: str) -> List[str]:
    """Rust ``str::lines`` semantics."""
    parts = markdown.split("\n")
    if parts and parts[-1] == "":
        parts.pop()
    return [p[:-1] if p.endswith("\r") else p for p in parts]


def find_good_split_point(text_bytes: bytes, approximate_position: int) -> int:
    """Port of src/chunker.rs:185-215 (byte offsets)."""
    if approximate_position < 0:
        # chunk_overlap > chunk_size: Rust usize subtraction wraps in release
        # mode, making approximate_position >= len -> return len
        return len(text_bytes)
    if approximate_position >= len(text_bytes):
        return len(text_bytes)
    search_text = text_bytes[approximate_position:]

    m = _PARAGRAPH_BOUNDARY.search(search_text)
    if m:
        return approximate_position + m.end()
    m = _SENTENCE_BOUNDARY.search(search_text)
    if m:
        return approximate_position + m.end()
    pos = search_text.find(b"\n")
    if pos != -1:
        return approximate_position + pos + 1
    for i, byte in enumerate(search_text):
        # ASCII whitespace check mirrors char::is_whitespace for our corpus
        if byte in (0x20, 0x09, 0x0A, 0x0B, 0x0C, 0x0D):
            return approximate_position + i + 1
    return approximate_position


def calculate_semantic_density(text: str) -> float:
    """Port of src/chunker.rs:219-244."""
    word_count = float(len(text.split()))
    if word_count == 0.0:
        return 0.0
    semantic_indicators = 0.0
    semantic_indicators += len(_SEMANTIC_PATTERNS.findall(text)) * 0.7
    semantic_indicators += len(_UPPERCASE_WORD.findall(text)) * 0.5
    semantic_indicators += len(_NUMERIC_PATTERN.findall(text)) * 0.3
    density = min(semantic_indicators / word_count, 1.0)
    length_bonus = min(word_count / 100.0, 0.2)
    return density + length_bonus


def _create_chunk_object(
    content: str, heading: Optional[str], level: int, position: int
) -> Chunk:
    """Port of src/chunker.rs:157-181."""
    return Chunk(
        content=content,
        metadata=ChunkMetadata(
            heading=heading,
            level=level,
            position=position,
            word_count=len(content.split()),
            char_count=len(content),
            semantic_density=calculate_semantic_density(content),
        ),
    )


def semantic_chunking(
    markdown: str, chunk_size: int, chunk_overlap: int
) -> List[Chunk]:
    """Port of src/chunker.rs:75-154."""
    lines = _lines(markdown)
    chunks: List[Chunk] = []

    current_chunk = ""
    current_heading: Optional[str] = None
    current_level = 0
    current_position = 0

    for line in lines:
        m = _HEADING_RE.match(line)
        if m:
            heading_level = len(m.group(1))
            heading_text = m.group(2)
            if current_chunk:
                chunks.append(
                    _create_chunk_object(
                        current_chunk, current_heading, current_level, current_position
                    )
                )
                current_position += 1
            current_heading = heading_text
            current_level = heading_level
            current_chunk = line
        else:
            if current_chunk:
                current_chunk += "\n"
            current_chunk += line

            chunk_bytes = current_chunk.encode("utf-8")
            if len(chunk_bytes) > chunk_size:
                split_point = find_good_split_point(
                    chunk_bytes, chunk_size - chunk_overlap
                )
                first_part = chunk_bytes[:split_point].decode("utf-8")
                remaining = chunk_bytes[split_point:].decode("utf-8")
                chunks.append(
                    _create_chunk_object(
                        first_part, current_heading, current_level, current_position
                    )
                )
                current_position += 1
                current_chunk = remaining.strip()

    if current_chunk:
        chunks.append(
            _create_chunk_object(
                current_chunk, current_heading, current_level, current_position
            )
        )
    return chunks


def create_semantic_chunks(
    markdown: str, chunk_size: int, chunk_overlap: int
) -> List[str]:
    """Port of src/chunker.rs:62-72 (content strings only, as over PyO3)."""
    return [c.content for c in semantic_chunking(markdown, chunk_size, chunk_overlap)]


# Alias matching the PyO3 name (src/lib.rs) / markdown_lab_rs.chunk_markdown
chunk_markdown = create_semantic_chunks
