"""Ports of tests/unit/test_sitemap_utils.py with a dict-backed fetcher."""

from markdown_lab_spark.oracle.sitemap import (
    SitemapURL,
    export_urls_lines,
    filter_urls,
    parse_robots,
    parse_sitemap,
)

SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
    <url>
        <loc>https://example.com/</loc>
        <lastmod>2023-05-17</lastmod>
        <changefreq>daily</changefreq>
        <priority>1.0</priority>
    </url>
    <url>
        <loc>https://example.com/about</loc>
        <lastmod>2023-05-16</lastmod>
        <changefreq>weekly</changefreq>
        <priority>0.8</priority>
    </url>
    <url>
        <loc>https://example.com/contact</loc>
        <changefreq>monthly</changefreq>
        <priority>0.5</priority>
    </url>
</urlset>
"""


def test_parse_sitemap():
    fetcher = {"https://example.com/sitemap.xml": SITEMAP}.get
    urls = parse_sitemap("https://example.com", fetcher)
    assert len(urls) == 3
    assert urls[0].loc == "https://example.com/"
    assert urls[0].lastmod == "2023-05-17"
    assert urls[0].changefreq == "daily"
    assert urls[0].priority == 1.0
    assert urls[2].lastmod is None
    assert urls[2].priority == 0.5


def test_parse_sitemap_index():
    responses = {
        "https://example.com/sitemap.xml": """<?xml version="1.0" encoding="UTF-8"?>
            <sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
                <sitemap><loc>https://example.com/sitemap1.xml</loc></sitemap>
                <sitemap><loc>https://example.com/sitemap2.xml</loc></sitemap>
            </sitemapindex>""",
        "https://example.com/sitemap1.xml": """<?xml version="1.0"?>
            <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
                <url><loc>https://example.com/page1</loc><priority>0.9</priority></url>
            </urlset>""",
        "https://example.com/sitemap2.xml": """<?xml version="1.0"?>
            <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
                <url><loc>https://example.com/page2</loc><priority>0.7</priority></url>
            </urlset>""",
    }
    urls = parse_sitemap("https://example.com/sitemap.xml", responses.get)
    assert {u.loc for u in urls} == {
        "https://example.com/page1",
        "https://example.com/page2",
    }


def test_robots_declared_sitemap_wins():
    responses = {
        "https://example.com/robots.txt": """
            User-agent: *
            Disallow: /private/

            Sitemap: https://example.com/custom_sitemap.xml
            """,
        "https://example.com/custom_sitemap.xml": """<?xml version="1.0"?>
            <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
                <url><loc>https://example.com/home</loc><priority>1.0</priority></url>
            </urlset>""",
    }
    urls = parse_sitemap("https://example.com", responses.get)
    assert len(urls) == 1
    assert urls[0].loc == "https://example.com/home"


def test_sitemap_index_cycle_terminates():
    responses = {
        "https://example.com/sitemap.xml": """<?xml version="1.0"?>
            <sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
                <sitemap><loc>https://example.com/sitemap.xml</loc></sitemap>
                <sitemap><loc>https://example.com/sitemap1.xml</loc></sitemap>
            </sitemapindex>""",
        "https://example.com/sitemap1.xml": """<?xml version="1.0"?>
            <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
                <url><loc>https://example.com/a</loc></url>
            </urlset>""",
    }
    urls = parse_sitemap("https://example.com/sitemap.xml", responses.get)
    assert [u.loc for u in urls] == ["https://example.com/a"]


def _urls():
    return [
        SitemapURL("https://e.com/", priority=1.0, lastmod="2023-01-01"),
        SitemapURL("https://e.com/blog/post1", priority=0.8),
        SitemapURL("https://e.com/blog/post2", priority=0.3),
        SitemapURL("https://e.com/private/x", priority=None),
    ]


def test_filter_priority():
    out = filter_urls(_urls(), min_priority=0.5)
    # None priority passes (sitemap_utils.py:374-380)
    assert [u.loc for u in out] == [
        "https://e.com/",
        "https://e.com/blog/post1",
        "https://e.com/private/x",
    ]


def test_filter_include_exclude_limit():
    out = filter_urls(_urls(), include_patterns=[r"/blog/"])
    assert [u.loc for u in out] == [
        "https://e.com/blog/post1",
        "https://e.com/blog/post2",
    ]
    out = filter_urls(_urls(), exclude_patterns=[r"/private/"])
    assert all("/private/" not in u.loc for u in out)
    out = filter_urls(_urls(), limit=2)
    assert len(out) == 2  # discovery order preserved


def test_export_lines():
    lines = export_urls_lines(_urls()[:2])
    assert lines[0] == "https://e.com/,1.0,2023-01-01"
    assert lines[1] == "https://e.com/blog/post1,0.8"


def test_parse_robots_allow_deny():
    rules = parse_robots(
        """
        User-agent: *
        Disallow: /private/
        Allow: /private/ok/
        Sitemap: https://e.com/sm.xml
        """
    )
    assert rules.sitemaps == ["https://e.com/sm.xml"]
    assert rules.is_allowed("/public/x")
    assert not rules.is_allowed("/private/secret")
    assert rules.is_allowed("/private/ok/page")  # longest prefix wins


def test_robots_wildcard_rfc9309_oracle():
    from markdown_lab_spark.oracle.sitemap import parse_robots

    # the RFC's documented pattern forms: *, trailing-$ anchor, both
    rr = parse_robots(
        "User-agent: *\n"
        "Disallow: /*.php\n"
        "Allow: /shared*.php\n"
        "Disallow: /fish*.asc$\n"
        "Disallow: /exact$\n"
    )
    assert not rr.is_allowed("/index.php")
    assert not rr.is_allowed("/a/b/deep.php")  # * spans path segments
    assert rr.is_allowed("/shared-lib.php")  # longer Allow wins
    assert not rr.is_allowed("/fishery/x.asc")
    assert rr.is_allowed("/fishery/x.asc.txt")  # $ anchors at end
    assert not rr.is_allowed("/exact")
    assert rr.is_allowed("/exact/sub")  # $ anchored: no prefix match
    assert rr.is_allowed("/page.html")
    # mid-pattern $ is a literal octet, not an anchor
    rr2 = parse_robots("User-agent: *\nDisallow: /a$b\n")
    assert not rr2.is_allowed("/a$b/c")
    assert rr2.is_allowed("/ab/c")
    # regex metacharacters in paths are literal
    rr3 = parse_robots("User-agent: *\nDisallow: /a.b(c)+\n")
    assert not rr3.is_allowed("/a.b(c)+x")
    assert rr3.is_allowed("/aXb(c)+x")
