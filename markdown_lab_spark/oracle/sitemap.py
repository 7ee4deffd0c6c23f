"""Sitemap + robots.txt parsing: port of markdown_lab/utils/sitemap_utils.py.

Network fetches are replaced by a ``fetcher`` callable (url -> Optional[str])
— in the engine that callable reads from the pages corpus. The recursive
sitemap-index walk, candidate-location fallback, and filter semantics are
line-for-line ports.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass
from typing import Callable, List, Optional, Set, Tuple
from urllib.parse import urlsplit

Fetcher = Callable[[str], Optional[str]]


@dataclass
class SitemapURL:
    """Port of markdown_lab/utils/sitemap_utils.py:21-28."""

    loc: str
    lastmod: Optional[str] = None
    changefreq: Optional[str] = None
    priority: Optional[float] = None


_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"


def find_sitemaps_in_robots(base_url: str, fetcher: Fetcher) -> List[str]:
    """Port of _find_sitemaps_in_robots (sitemap_utils.py:94-127)."""
    parsed = urlsplit(base_url)
    robots_url = f"{parsed.scheme}://{parsed.netloc}/robots.txt"
    content = fetcher(robots_url)
    if content is None:
        return []
    sitemaps: List[str] = []
    for line in content.splitlines():
        line = line.strip()
        if line.lower().startswith("sitemap:"):
            sitemaps.append(line.split(":", 1)[1].strip())
    return sitemaps


def _tag_name(el: ET.Element) -> str:
    return el.tag.split("}", 1)[-1]


def parse_sitemap_xml(content: str) -> Tuple[List[SitemapURL], List[str]]:
    """Port of _parse_sitemap_xml (sitemap_utils.py:129-236).

    Returns (urls, child_sitemap_urls); namespace-aware with a
    namespace-less fallback.
    """
    urls: List[SitemapURL] = []
    children: List[str] = []
    try:
        root = ET.fromstring(content)
    except ET.ParseError:
        return urls, children

    root_name = _tag_name(root)
    if root_name == "sitemapindex":
        for sm in root:
            if _tag_name(sm) != "sitemap":
                continue
            for child in sm:
                if _tag_name(child) == "loc" and child.text:
                    children.append(child.text.strip())
    elif root_name == "urlset":
        for url_el in root:
            if _tag_name(url_el) != "url":
                continue
            loc = lastmod = changefreq = None
            priority: Optional[float] = None
            for child in url_el:
                name = _tag_name(child)
                text = child.text.strip() if child.text else None
                if name == "loc":
                    loc = text
                elif name == "lastmod":
                    lastmod = text
                elif name == "changefreq":
                    changefreq = text
                elif name == "priority" and text:
                    try:
                        priority = float(text)
                    except ValueError:
                        priority = None
            if loc:
                urls.append(
                    SitemapURL(
                        loc=loc, lastmod=lastmod, changefreq=changefreq, priority=priority
                    )
                )
    return urls, children


def process_sitemap(
    sitemap_url: str, fetcher: Fetcher, processed: Optional[Set[str]] = None
) -> List[SitemapURL]:
    """Recursive index walk with seen-set, port of sitemap_utils.py:279-307."""
    if processed is None:
        processed = set()
    if sitemap_url in processed:
        return []
    processed.add(sitemap_url)
    content = fetcher(sitemap_url)
    if content is None:
        return []
    urls, children = parse_sitemap_xml(content)
    for child in children:
        urls.extend(process_sitemap(child, fetcher, processed))
    return urls


def parse_sitemap(base_url: str, fetcher: Fetcher) -> List[SitemapURL]:
    """Port of parse_sitemap (sitemap_utils.py:309-351).

    robots.txt-declared sitemaps first, then candidate locations; stop at
    the first candidate that yields URLs.
    """
    parsed = urlsplit(base_url)
    root = f"{parsed.scheme}://{parsed.netloc}"

    if base_url.endswith(".xml"):
        return process_sitemap(base_url, fetcher)

    sitemap_candidates = find_sitemaps_in_robots(base_url, fetcher)
    sitemap_candidates += [
        f"{root}/sitemap.xml",
        f"{root}/sitemap_index.xml",
        f"{root}/sitemap/sitemap.xml",
        f"{root}/sitemaps/sitemap.xml",
    ]
    processed: Set[str] = set()
    for candidate in sitemap_candidates:
        urls = process_sitemap(candidate, fetcher, processed)
        if urls:
            return urls
    return []


def filter_urls(
    urls: List[SitemapURL],
    min_priority: Optional[float] = None,
    include_patterns: Optional[List[str]] = None,
    exclude_patterns: Optional[List[str]] = None,
    limit: Optional[int] = None,
) -> List[SitemapURL]:
    """Port of filter_urls (sitemap_utils.py:353-407); list order preserved."""
    filtered = urls
    if min_priority is not None:
        filtered = [
            u for u in filtered if u.priority is None or u.priority >= min_priority
        ]
    if include_patterns:
        compiled = [re.compile(p) for p in include_patterns]
        filtered = [u for u in filtered if any(p.search(u.loc) for p in compiled)]
    if exclude_patterns:
        compiled = [re.compile(p) for p in exclude_patterns]
        filtered = [u for u in filtered if not any(p.search(u.loc) for p in compiled)]
    if limit is not None:
        filtered = filtered[:limit]
    return filtered


def export_urls_lines(urls: List[SitemapURL]) -> List[str]:
    """Port of export_urls_to_file line format (sitemap_utils.py:409-431)."""
    lines = []
    for url in urls:
        parts = [url.loc]
        if url.priority is not None:
            parts.append(str(url.priority))
        if url.lastmod is not None:
            parts.append(url.lastmod)
        lines.append(",".join(parts))
    return lines


# --------------------------------------------------------------------------
# robots.txt allow/deny (north_rule extension; the reference only reads
# Sitemap: lines — fixtures in tests/unit/test_sitemap_utils.py:124-129 carry
# Disallow rules the engine must honor at fetch time).
# --------------------------------------------------------------------------
@dataclass
class RobotsRules:
    """Longest-prefix-match allow/deny rules for one host ('*' agent group)."""

    rules: List[Tuple[str, bool]]  # (path_prefix, is_allow), longest first
    sitemaps: List[str]
    # Crawl-delay of the '*' group, seconds (de-facto standard honored by
    # Bing/Yandex; Google ignores it — a polite crawler honors it).
    # None = not declared.
    crawl_delay: "float | None" = None

    def is_allowed(self, path: str) -> bool:
        for prefix, is_allow in self.rules:
            rx = robots_pattern_regex(prefix)
            if (
                re.match(rx, path) is not None
                if rx is not None
                else path.startswith(prefix)
            ):
                return is_allow
        return True


def robots_pattern_regex(pattern: str) -> "str | None":
    """RFC 9309 path-pattern -> anchored regex, or None for a plain
    prefix (the startswith fast path). Per the RFC: ``*`` matches any
    character sequence, a TRAILING ``$`` anchors the match at the end
    of the path (a mid-pattern ``$`` is a literal octet). The escape
    set is Python's re.escape, whose backslash-punctuation escapes are
    also valid Java regex literals — the JVM matcher
    (crawler.robots_filter via regexp_like) and this oracle compile the
    SAME string; agreement is pinned by test."""
    if "*" not in pattern and not pattern.endswith("$"):
        return None
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "^" + ".*".join(re.escape(part) for part in body.split("*"))
    return rx + "$" if anchored else rx


def parse_robots(content: str) -> RobotsRules:
    """Parse a robots.txt body for the ``*`` agent group + Sitemap lines."""
    rules: List[Tuple[str, bool]] = []
    sitemaps: List[str] = []
    crawl_delay: "float | None" = None
    active = False
    seen_any_agent = False
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            active = value == "*"
            seen_any_agent = True
        elif key == "sitemap":
            sitemaps.append(value)
        elif key in ("allow", "disallow") and (active or not seen_any_agent):
            if value:
                rules.append((value, key == "allow"))
            # empty Disallow: means allow-all (no rule)
        elif key == "crawl-delay" and (active or not seen_any_agent):
            try:
                d = float(value)
            except ValueError:
                continue  # malformed value: ignored, like bad rules
            if d > 0:
                crawl_delay = d
    # longest prefix wins; Allow wins length ties
    rules.sort(key=lambda r: (len(r[0]), r[1]), reverse=True)
    return RobotsRules(rules=rules, sitemaps=sitemaps, crawl_delay=crawl_delay)
