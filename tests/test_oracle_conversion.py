"""Oracle parity suite: every assertion ported from the reference's tests.

Sources: /root/reference/src/tests.rs, tests/rust/test_python_bindings.py,
tests/integration/test_comprehensive.py (structure assertions only).
"""

from markdown_lab_spark.oracle import (
    chunk_markdown,
    clean_html,
    convert_html,
    convert_to_markdown,
    extract_links,
    extract_main_content,
    parse_html_to_document,
)
from markdown_lab_spark.oracle.markdown_converter import (
    document_to_json,
    document_to_markdown,
    document_to_xml,
)


# --- src/tests.rs html_parser_tests ---------------------------------------
def test_extract_main_content():
    html = (
        "<html><head><title>Test</title></head><body><main><h1>Main Content</h1>"
        "<p>Test paragraph</p></main><footer>Footer content</footer></body></html>"
    )
    result = extract_main_content(html)
    content = result.root_element().html()
    assert "Main Content" in content
    assert "Test paragraph" in content
    assert "Footer content" not in content


def test_clean_html():
    html = (
        "<div><script>alert('test');</script><p>Keep this content</p>"
        '<style>.test{color:red;}</style><div class="ad">Remove this ad</div></div>'
    )
    result = clean_html(html)
    assert "Keep this content" in result
    assert "alert('test')" not in result
    assert "Remove this ad" not in result
    assert ".test{color:red;}" not in result


def test_extract_links():
    html = (
        '<div><a href="https://example.com">Example</a>'
        '<a href="/relative/path">Relative</a>'
        '<a href="javascript:void(0)">JS Link</a>'
        '<a href="#section">Hash Link</a></div>'
    )
    links = extract_links(html, "https://test.com")
    assert "https://example.com" in links
    assert "https://test.com/relative/path" in links
    assert len(links) == 2


def test_extract_links_sorted_unique():
    # sort_unstable + dedup semantics (src/html_parser.rs:247-251)
    html = (
        '<a href="/b">B</a><a href="/a">A</a><a href="/b">B again</a>'
        '<a href="/c">C</a>'
    )
    links = extract_links(html, "https://h.com")
    assert links == ["https://h.com/a", "https://h.com/b", "https://h.com/c"]


# --- src/tests.rs markdown_converter_tests ---------------------------------
def test_convert_basic_html():
    html = (
        "<html><head><title>Test Page</title></head><body><h1>Main Title</h1>"
        "<p>This is a test paragraph.</p><ul><li>Item 1</li><li>Item 2</li></ul>"
        "</body></html>"
    )
    markdown = convert_to_markdown(html, "https://example.com")
    assert "# Test Page" in markdown
    assert "# Main Title" in markdown
    assert "This is a test paragraph." in markdown
    assert "- Item 1" in markdown
    assert "- Item 2" in markdown


def test_convert_links_and_images():
    html = '<div><a href="/test">Test Link</a><img src="/image.jpg" alt="Test Image"></div>'
    markdown = convert_to_markdown(html, "https://example.com")
    assert "[Test Link](https://example.com/test)" in markdown
    assert "![Test Image](https://example.com/image.jpg)" in markdown


def test_convert_code_blocks():
    html = '<pre><code class="language-rust">fn main() { println!("Hello, world!"); }</code></pre>'
    markdown = convert_to_markdown(html, "https://example.com")
    assert "```rust" in markdown
    assert "fn main()" in markdown
    assert "```" in markdown


def test_pre_and_code_both_emitted():
    # "pre, code" selector matches BOTH pre and nested code: two code blocks
    # (intentional reference quirk, src/markdown_converter.rs:245-266)
    html = '<pre><code class="language-py">x = 1</code></pre>'
    doc = parse_html_to_document(html, "https://example.com")
    assert len(doc.code_blocks) == 2
    assert doc.code_blocks[0].language == ""  # the <pre>
    assert doc.code_blocks[1].language == "py"  # the <code>


def test_skip_unresolvable_links():
    html = (
        '<div><a href="javascript:void(0)">Skip JS</a>'
        '<a href="::::bad::::">Skip Bad</a><a href="/ok">OK</a></div>'
    )
    markdown = convert_to_markdown(html, "https://example.com")
    assert "Skip JS" not in markdown
    assert "::::bad::::" not in markdown
    assert "[OK](https://example.com/ok)" in markdown


# --- tests/rust/test_python_bindings.py -------------------------------------
def test_convert_html_to_markdown_binding():
    html = """
        <html>
            <head><title>Test Page</title></head>
            <body>
                <h1>Main Title</h1>
                <p>This is a test paragraph.</p>
            </body>
        </html>
    """
    markdown = convert_to_markdown(html, "https://example.com")
    assert "# Test Page" in markdown
    assert "# Main Title" in markdown
    assert "This is a test paragraph." in markdown


def test_chunk_markdown_binding():
    markdown = """
# Title

## Section 1

This is a test paragraph.

## Section 2

* List item 1
* List item 2
    """
    chunks = chunk_markdown(markdown, 500, 50)
    assert len(chunks) > 0
    assert any("# Title" in c for c in chunks)
    assert any("## Section 1" in c for c in chunks)
    assert any("## Section 2" in c for c in chunks)


# --- src/tests.rs chunker_tests ---------------------------------------------
def test_basic_chunking():
    markdown = (
        "# Title\n\n## Section 1\n\nThis is a test paragraph.\n\n"
        "## Section 2\n\n* List item 1\n* List item 2"
    )
    chunks = chunk_markdown(markdown, 500, 50)
    assert chunks
    assert "# Title" in chunks[0]


def test_chunk_overlap():
    markdown = "# First\n\nContent 1\n\n# Second\n\nContent 2\n\n# Third\n\nContent 3"
    chunks = chunk_markdown(markdown, 20, 10)
    assert len(chunks) > 1
    assert "First" in chunks[0]
    assert "Second" in chunks[1]


# --- exact-output (golden) checks beyond the reference's substrings ----------
def test_markdown_exact_struct_order():
    """Struct order: title, headings, paragraphs, links, images, lists,
    code blocks, blockquotes — NOT document order."""
    html = (
        "<html><head><title>T</title></head><body>"
        "<blockquote>quoted\nline2</blockquote>"
        '<pre><code class="language-c">int x;</code></pre>'
        "<ol><li>one</li><li>two</li></ol>"
        "<ul><li>bullet</li></ul>"
        '<img src="/i.png" alt="A">'
        '<a href="/l">L</a>'
        "<p>para</p>"
        "<h2>H2</h2><h1>H1</h1>"
        "</body></html>"
    )
    md = convert_to_markdown(html, "https://x.com")
    expected = (
        "# T\n\n"
        "# H1\n\n"
        "## H2\n\n"
        "para\n\n"
        "[L](https://x.com/l)\n\n"
        "![A](https://x.com/i.png)\n\n"
        "- bullet\n\n"
        "1. one\n2. two\n\n"
        "```\nint x;\n```\n\n"
        "```c\nint x;\n```\n\n"
        "> quoted\n> line2"
    )
    assert md == expected


def test_title_fallback_no_title():
    md = convert_to_markdown("<p>hello</p>", "https://x.com")
    assert md.startswith("# No Title")


def test_entity_decoding():
    md = convert_to_markdown(
        "<html><head><title>A &amp; B</title></head><body><p>x &lt; y</p></body></html>",
        "https://x.com",
    )
    assert "# A & B" in md
    assert "x < y" in md


def test_unicode_preserved():
    md = convert_to_markdown("<p>你好世界 \U0001f600</p>", "https://x.com")
    assert "你好世界 \U0001f600" in md


def test_absolute_bare_host_link_gets_slash():
    # rust-url Url::join("https://example.com") serializes with "/" path
    md = convert_to_markdown('<a href="https://other.com">O</a>', "https://x.com")
    assert "[O](https://other.com/)" in md


def test_json_xml_shapes():
    html = (
        "<html><head><title>T</title></head><body><h1>H</h1><p>p1</p>"
        "<ul><li>a</li></ul></body></html>"
    )
    doc = parse_html_to_document(html, "https://x.com")
    js = document_to_json(doc)
    assert js.startswith('{\n  "title": "T",\n  "base_url": "https://x.com",')
    assert '"headings": [\n    {\n      "level": 1,\n      "text": "H"\n    }\n  ]' in js
    xml = document_to_xml(doc)
    assert xml.startswith("<Document><title>T</title><base_url>https://x.com</base_url>")
    assert "<headings><level>1</level><text>H</text></headings>" in xml
    assert "<lists><ordered>false</ordered><items>a</items></lists>" in xml
    assert convert_html(html, "https://x.com", "json") == js
    assert convert_html(html, "https://x.com", "xml") == xml


def test_chunker_byte_split_semantics():
    # Rust checks size once per appended NON-heading line (src/chunker.rs:121)
    # — a single long line splits exactly once, at the first word boundary
    # after chunk_size - overlap bytes.
    text = "# H\n" + "word " * 100  # one 500-byte line
    chunks = chunk_markdown(text, 100, 20)
    assert len(chunks) == 2
    # split point: byte 80 is mid-"word ...", first whitespace after 80
    assert len(chunks[0].encode()) in (81, 82, 83, 84, 85)
    assert chunks[1].startswith("word")
    # many short lines re-check every line -> many chunks
    text2 = "# H\n" + "\n".join(["word word word word"] * 40)
    chunks2 = chunk_markdown(text2, 100, 20)
    assert len(chunks2) > 5


def test_chunker_heading_flush_positions():
    from markdown_lab_spark.oracle.chunker import semantic_chunking

    md = "# A\n\nbody a\n\n## B\n\nbody b"
    chunks = semantic_chunking(md, 1000, 200)
    assert [c.metadata.position for c in chunks] == list(range(len(chunks)))
    assert chunks[0].metadata.heading == "A"
    assert chunks[0].metadata.level == 1
    assert chunks[-1].metadata.heading == "B"
    assert chunks[-1].metadata.level == 2
    assert chunks[0].content.startswith("# A")


def test_boilerplate_removed_in_conversion():
    html = (
        "<html><head><title>T</title></head><body>"
        "<header>site header</header><nav>nav bar</nav>"
        '<div class="sidebar">side</div><main><p>real content</p></main>'
        "<footer>footer text</footer></body></html>"
    )
    md = convert_to_markdown(html, "https://x.com")
    assert "real content" in md
    assert "site header" not in md
    assert "nav bar" not in md
    assert "footer text" not in md
    assert "side" not in md
