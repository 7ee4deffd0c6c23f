"""Python-side semantic chunker: port of markdown_lab/utils/chunk_utils.py.

Differences vs the Rust chunker (oracle/chunker.py) are intentional parity:
the Python side splits into header-hierarchy sections (first-h2-under-h1
folds into the h1 section) and windows large sections by WORD count with a
chars-per-word ratio of 5 (markdown_lab/utils/chunk_utils.py:56-60).

``created_at`` is injectable for determinism; the reference stamps
``datetime.now().isoformat()`` (chunk_utils.py:160), which the reference's
own tests exclude from assertions.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

from .url_utils import get_domain_from_url

DEFAULT_CHUNK_SIZE = 1000  # markdown_lab/core/config.py chunk_size
DEFAULT_CHUNK_OVERLAP = 200  # markdown_lab/core/config.py chunk_overlap
WORDS_PER_CHAR_RATIO = 5  # markdown_lab/utils/chunk_utils.py:56-60

_MARKDOWN_HEADER_RE = re.compile(r"^#+ ", re.MULTILINE)


@dataclass
class Chunk:
    """Port of the Chunk dataclass (markdown_lab/utils/chunk_utils.py:17-26)."""

    id: str
    content: str
    metadata: Dict[str, Any] = field(default_factory=dict)
    source_url: str = ""
    created_at: str = ""
    chunk_type: str = ""


def _get_heading_level(line: str) -> int:
    """Port of chunk_utils.py:82-84 (counts ALL leading '#', no 1-6 cap)."""
    return len(line) - len(line.lstrip("#")) if line.startswith("#") else 0


def split_markdown_sections(markdown_content: str) -> List[Tuple[str, str]]:
    """Header-hierarchy section split, port of chunk_utils.py:75-137."""
    sections: List[Tuple[str, str]] = []
    current_section = ""
    current_heading = ""
    current_heading_level = 0
    seen_h2_under_h1 = False

    for line in markdown_content.split("\n"):
        if line.startswith("#"):
            heading_level = _get_heading_level(line)
            if current_heading_level == 0:
                current_heading = line
                current_heading_level = heading_level
                current_section = line + "\n"
                if heading_level == 1:
                    seen_h2_under_h1 = False
            elif heading_level == 1:
                if current_section:
                    sections.append((current_heading, current_section))
                current_heading = line
                current_heading_level = heading_level
                current_section = line + "\n"
                seen_h2_under_h1 = False
            elif heading_level == 2:
                if current_heading_level == 1 and not seen_h2_under_h1:
                    current_section += line + "\n"
                    seen_h2_under_h1 = True
                else:
                    if current_section:
                        sections.append((current_heading, current_section))
                    current_heading = line
                    current_heading_level = heading_level
                    current_section = line + "\n"
            elif heading_level > current_heading_level:
                current_section += line + "\n"
            else:
                if current_section:
                    sections.append((current_heading, current_section))
                current_heading = line
                current_heading_level = heading_level
                current_section = line + "\n"
                if heading_level == 1:
                    seen_h2_under_h1 = False
        else:
            current_section += line + "\n"

    if current_section:
        sections.append((current_heading, current_section))
    return sections


def create_chunks_from_markdown(
    markdown_content: str,
    source_url: str,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
    created_at: str = "",
) -> List[Chunk]:
    """Port of ContentChunker.create_chunks_from_markdown (chunk_utils.py:62-198)."""
    sections = split_markdown_sections(markdown_content)
    chunks: List[Chunk] = []
    domain = get_domain_from_url(source_url)

    words_per_chunk = chunk_size // WORDS_PER_CHAR_RATIO
    overlap_words = chunk_overlap // WORDS_PER_CHAR_RATIO
    step = words_per_chunk - overlap_words

    for section_heading, section_content in sections:
        if len(section_content) <= chunk_size:
            chunk_id = hashlib.md5(
                f"{source_url}:{section_heading}".encode()
            ).hexdigest()
            chunks.append(
                Chunk(
                    id=chunk_id,
                    content=section_content,
                    metadata={
                        "heading": section_heading,
                        "domain": domain,
                        "word_count": len(section_content.split()),
                        "char_count": len(section_content),
                    },
                    source_url=source_url,
                    created_at=created_at,
                    chunk_type="section",
                )
            )
        else:
            words = section_content.split()
            for i in range(0, len(words), step):
                chunk_words = words[i : i + words_per_chunk]
                if not chunk_words:
                    continue
                chunk_content = " ".join(chunk_words)
                chunk_id = hashlib.md5(
                    f"{source_url}:{section_heading}:{i}".encode()
                ).hexdigest()
                chunks.append(
                    Chunk(
                        id=chunk_id,
                        content=chunk_content,
                        metadata={
                            "heading": section_heading,
                            "domain": domain,
                            "position": i // step,
                            "word_count": len(chunk_words),
                            "char_count": len(chunk_content),
                        },
                        source_url=source_url,
                        created_at=created_at,
                        chunk_type="content_chunk",
                    )
                )
    return chunks


def create_semantic_chunks(
    content: str,
    source_url: str,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
    created_at: str = "",
) -> List[Chunk]:
    """Port of create_semantic_chunks (chunk_utils.py:229-290)."""
    if _MARKDOWN_HEADER_RE.search(content):
        return create_chunks_from_markdown(
            content, source_url, chunk_size, chunk_overlap, created_at
        )

    chunks: List[Chunk] = []
    domain = get_domain_from_url(source_url)
    words = content.split()
    words_per_chunk = chunk_size // WORDS_PER_CHAR_RATIO
    overlap_words = chunk_overlap // WORDS_PER_CHAR_RATIO
    step = words_per_chunk - overlap_words

    for i in range(0, len(words), step):
        chunk_words = words[i : i + words_per_chunk]
        if not chunk_words:
            continue
        chunk_content = " ".join(chunk_words)
        chunk_id = hashlib.md5(f"{source_url}:text:{i}".encode()).hexdigest()
        chunks.append(
            Chunk(
                id=chunk_id,
                content=chunk_content,
                metadata={
                    "domain": domain,
                    "position": i // step,
                    "word_count": len(chunk_words),
                    "char_count": len(chunk_content),
                },
                source_url=source_url,
                created_at=created_at,
                chunk_type="text_chunk",
            )
        )
    return chunks
