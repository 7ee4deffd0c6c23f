"""Ports of tests/unit/test_chunk_utils.py + section-split semantics checks."""

import hashlib

from markdown_lab_spark.oracle.chunk_utils import (
    create_chunks_from_markdown,
    create_semantic_chunks,
    split_markdown_sections,
)


MARKDOWN = """# Main Title

This is an introduction paragraph.

## Section 1

This is content for section 1.

### Subsection 1.1

More detailed content here.

## Section 2

Final section content.
"""


def test_sections_first_h2_folds_into_h1():
    sections = split_markdown_sections(MARKDOWN)
    # first h2 under h1 folds into the h1 section (chunk_utils.py:108-111)
    headings = [h for h, _ in sections]
    assert headings[0] == "# Main Title"
    assert "## Section 1" in sections[0][1]
    assert "### Subsection 1.1" in sections[0][1]  # deeper heading folds in
    assert headings[1] == "## Section 2"
    assert len(sections) == 2


def test_chunks_from_markdown_small_sections():
    chunks = create_chunks_from_markdown(MARKDOWN, "https://example.com/page")
    assert all(c.chunk_type == "section" for c in chunks)
    assert chunks[0].metadata["domain"] == "example.com"
    expected_id = hashlib.md5(
        "https://example.com/page:# Main Title".encode()
    ).hexdigest()
    assert chunks[0].id == expected_id
    assert chunks[0].metadata["word_count"] == len(chunks[0].content.split())
    assert chunks[0].metadata["char_count"] == len(chunks[0].content)


def test_large_section_word_windows():
    body = " ".join(f"w{i}" for i in range(1000))
    md = f"# Big\n\n{body}\n"
    chunks = create_chunks_from_markdown(md, "https://example.com/big", 1000, 200)
    # words_per_chunk=200, overlap=40, step=160
    assert all(c.chunk_type == "content_chunk" for c in chunks)
    assert len(chunks[0].content.split()) == 200
    # overlap: last 40 words of chunk 0 == first 40 of chunk 1
    w0 = chunks[0].content.split()
    w1 = chunks[1].content.split()
    assert w0[-40:] == w1[:40]
    assert chunks[0].metadata["position"] == 0
    assert chunks[1].metadata["position"] == 1
    expected_id = hashlib.md5("https://example.com/big:# Big:160".encode()).hexdigest()
    assert chunks[1].id == expected_id


def test_plain_text_chunking():
    text = " ".join(f"t{i}" for i in range(500))
    chunks = create_semantic_chunks(text, "https://example.com/t")
    assert all(c.chunk_type == "text_chunk" for c in chunks)
    expected_id = hashlib.md5("https://example.com/t:text:0".encode()).hexdigest()
    assert chunks[0].id == expected_id
    assert chunks[0].metadata["position"] == 0


def test_markdown_routing():
    # ^#+ " routes to markdown chunker (chunk_utils.py:255-256)
    md_chunks = create_semantic_chunks("# H\n\nbody", "https://e.com/x")
    assert md_chunks[0].chunk_type == "section"
    txt_chunks = create_semantic_chunks("no headings here", "https://e.com/x")
    assert txt_chunks[0].chunk_type == "text_chunk"


def test_heading_level_counts_all_hashes():
    # python counts ANY '#' prefix — '####### seven' is level 7 (no 1-6 cap)
    sections = split_markdown_sections("# A\n\n####### seven\n\nbody")
    assert len(sections) == 1  # level 7 > 1 folds into the h1 section
