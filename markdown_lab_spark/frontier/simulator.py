"""Single-process crawl simulator — the ordering oracle for the Spark crawler.

Implements the reference's crawl semantics directly (no Spark):

- seed order = input order (markdown_lab/core/scraper.py:474-498),
- per-page discovered links = lexicographically sorted unique
  (src/html_parser.rs:247-251),
- URL-seen short-circuit (markdown_lab/core/client.py:295-297),
- per-host politeness budget per wave (throttle rps -> budget
  = floor(rps * wave_seconds), markdown_lab/core/throttle.py:8-33),
- robots allow/deny (north_rule extension of sitemap_utils robots use).

Deterministic ordering contract shared with the Spark engine:
within a wave, a host's queue is ordered by (depth ASC, priority DESC,
canon_url ASC); the budgeted head is fetched, the tail carries over.

The Spark crawler must reproduce this trace exactly (same (url, wave,
depth, fetched) tuples and the same final URL-seen set).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Set, Tuple

from ..oracle.html_parser import extract_links
from ..oracle.sitemap import RobotsRules, parse_robots
from ..oracle.url_utils import get_domain_from_url, normalize_url


@dataclass(frozen=True)
class CrawlRecord:
    url: str  # canonical
    wave: int
    depth: int
    host: str
    fetched: bool  # False => robots-denied or fetch-miss (not in corpus)
    status: str  # "ok" | "fetch_miss" | "robots_denied"


@dataclass
class SimResult:
    records: List[CrawlRecord]
    seen: Set[str]

    def trace(self) -> Set[Tuple[str, int, int, str]]:
        return {(r.url, r.wave, r.depth, r.status) for r in self.records}


def load_robots(pages: Dict[str, str]) -> Dict[str, RobotsRules]:
    rules: Dict[str, RobotsRules] = {}
    for url, body in pages.items():
        if url.endswith("/robots.txt"):
            rules[get_domain_from_url(url)] = parse_robots(body)
    return rules


def _path_of(url: str) -> str:
    rest = url.split("://", 1)[-1]
    slash = rest.find("/")
    return rest[slash:] if slash >= 0 else "/"


def simulate_crawl(
    pages: Dict[str, str],
    seeds: List[str],
    rps: float = 1.0,
    wave_seconds: int = 10,
    max_waves: int = 100,
    robots: Optional[Dict[str, RobotsRules]] = None,
    max_retries: int = 0,
    max_file_size: Optional[int] = None,
) -> SimResult:
    if robots is None:
        robots = load_robots(pages)
    budget = max(1, int(max(0.1, rps) * wave_seconds))

    # frontier entries: canon_url -> (depth, priority, attempt)
    frontier: Dict[str, Tuple[int, float, int]] = {}
    for s in seeds:
        c = normalize_url(s)
        if c not in frontier:
            frontier[c] = (0, 1.0, 0)

    seen: Set[str] = set()
    records: List[CrawlRecord] = []

    for wave in range(max_waves):
        if not frontier:
            break
        # robots filter
        allowed: Dict[str, Tuple[int, float, int]] = {}
        for url, (depth, prio, attempt) in frontier.items():
            host = get_domain_from_url(url)
            rr = robots.get(host)
            if rr is not None and not rr.is_allowed(_path_of(url)):
                seen.add(url)
                records.append(
                    CrawlRecord(url, wave, depth, host, False, "robots_denied")
                )
            else:
                allowed[url] = (depth, prio, attempt)

        # per-host politeness: (depth ASC, priority DESC, url ASC), head=budget
        by_host: Dict[str, List[Tuple[int, float, str, int]]] = {}
        for url, (depth, prio, attempt) in allowed.items():
            by_host.setdefault(get_domain_from_url(url), []).append(
                (depth, prio, url, attempt)
            )
        scheduled: List[Tuple[str, int, float, int]] = []
        deferred: Dict[str, Tuple[int, float, int]] = {}
        for host, entries in by_host.items():
            entries.sort(key=lambda e: (e[0], -e[1], e[2]))
            for depth, prio, url, attempt in entries[:budget]:
                scheduled.append((url, depth, prio, attempt))
            for depth, prio, url, attempt in entries[budget:]:
                deferred[url] = (depth, prio, attempt)

        # fetch + convert + discover; misses with attempts left requeue (P2)
        discovered: Dict[str, Tuple[int, float, int]] = {}
        requeued: Dict[str, Tuple[int, float, int]] = {}
        for url, depth, prio, attempt in scheduled:
            host = get_domain_from_url(url)
            body = pages.get(url)
            if body is None:
                if attempt < max_retries:
                    requeued[url] = (depth, prio, attempt + 1)
                    records.append(
                        CrawlRecord(url, wave, depth, host, False, "retry")
                    )
                else:
                    seen.add(url)
                    records.append(
                        CrawlRecord(url, wave, depth, host, False, "fetch_miss")
                    )
                continue
            body_bytes = body.encode("utf-8") if isinstance(body, str) else body
            if max_file_size is not None and len(body_bytes) > max_file_size:
                # oversize is a TERMINAL skip (reference max_file_size,
                # core/config.py:44) — seen, no links, never retried
                seen.add(url)
                records.append(
                    CrawlRecord(url, wave, depth, host, False, "too_large")
                )
                continue
            seen.add(url)
            records.append(CrawlRecord(url, wave, depth, host, True, "ok"))
            if url.endswith(("/robots.txt", "/sitemap.xml")):
                continue  # non-HTML rows don't contribute links
            for link in extract_links(body, url):
                if not link.startswith(("http://", "https://")):
                    continue
                c = normalize_url(link)
                if c in seen or c in deferred:
                    continue
                if c in discovered:
                    # multiple parents in one wave: keep the MIN depth
                    # (matches the engine's groupBy min(parent_depth)+1)
                    discovered[c] = (min(discovered[c][0], depth + 1), 0.5, 0)
                else:
                    discovered[c] = (depth + 1, 0.5, 0)

        # scheduled urls may also appear in discovered via self-links
        for url, _, _, _ in scheduled:
            discovered.pop(url, None)
        for url in requeued:
            discovered.pop(url, None)

        frontier = {**deferred, **discovered, **requeued}

    return SimResult(records=records, seen=seen)
