"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).

Produces the Iceberg-shaped pages table ``(url:string, warc_ts:timestamp,
html:binary, text:string, lang:string)`` with a crawl graph known in closed
form: per-host page trees with intra-host chains, cross-host links, cycles,
dead links, filtered links (javascript:/#/data:/malformed), robots.txt rows
(with Disallow'd /private/ sections) and sitemap.xml rows. One hot host
carries ``hot_fraction`` of all pages for the skew drill.

Everything is seeded (default 42): same args -> byte-identical corpus.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone
from typing import Dict, List, Optional, Tuple

_WORDS = (
    "data spark crawl frontier page link host depth queue merge shuffle "
    "partition bloom filter robots sitemap markdown chunk overlap token "
    "vector index batch stream wave seed politeness budget skew salt "
    "analysis system model process implementation algorithm function"
).split()

_LANGS = ["en", "en", "en", "en", "de", "fr"]
_UNICODE_SNIPPETS = ["你好世界", "naïve café", "Grüße aus Köln", "emoji 😀 works"]


@dataclass
class CorpusSpec:
    hosts: int = 4
    pages_per_host: int = 60
    hot_fraction: float = 0.4  # hot host's share of total pages
    seed: int = 42
    private_fraction: float = 0.1  # pages under robots-Disallow'd /private/
    dead_link_every: int = 7
    cross_link_every: int = 3
    base_ts: datetime = field(
        default_factory=lambda: datetime(2024, 1, 1, tzinfo=timezone.utc)
    )


@dataclass
class Corpus:
    rows: List[Tuple[str, datetime, bytes, str, str]]  # url, ts, html, text, lang
    seeds: List[str]
    hosts: List[str]

    def pages_dict(self) -> Dict[str, str]:
        return {u: h.decode("utf-8") for u, _, h, _, _ in self.rows}


def _host_names(spec: CorpusSpec) -> List[str]:
    hosts = [f"site-{chr(ord('a') + i)}.example" for i in range(spec.hosts - 1)]
    return ["hot.example"] + hosts


def _page_counts(spec: CorpusSpec) -> Dict[str, int]:
    total = spec.hosts * spec.pages_per_host
    hot = int(total * spec.hot_fraction)
    rest = total - hot
    others = _host_names(spec)[1:]
    per = rest // max(1, len(others))
    counts = {h: per for h in others}
    counts["hot.example"] = hot
    return counts


def _page_url(host: str, i: int) -> str:
    section = "private" if i % 10 == 9 else ("docs" if i % 2 else "blog")
    return f"https://{host}/{section}/page-{i}"


def _make_html(
    rng: random.Random,
    host: str,
    idx: int,
    url: str,
    out_links: List[str],
    lang: str,
) -> Tuple[str, str]:
    """Returns (html, plain_text)."""
    title = f"{host} page {idx}"
    paras = []
    for _ in range(rng.randint(2, 5)):
        n = rng.randint(15, 40)
        paras.append(" ".join(rng.choice(_WORDS) for _ in range(n)))
    if lang != "en":
        paras.append(_UNICODE_SNIPPETS[idx % len(_UNICODE_SNIPPETS)])

    link_html = []
    for j, link in enumerate(out_links):
        link_html.append(f'<a href="{link}">link {j}</a>')
    # filtered-out link types every page (parity exercise)
    link_html.append('<a href="javascript:void(0)">js</a>')
    link_html.append('<a href="#frag">frag</a>')
    link_html.append('<a href="data:text/plain,x">data</a>')
    link_html.append('<a href=":::bad:::">bad</a>')

    items = "".join(f"<li>item {k}</li>" for k in range(rng.randint(2, 4)))
    code = f"def f_{idx}():\n    return {idx}"
    html = f"""<html><head><title>{title}</title>
<script>var tracking = {idx};</script>
<style>.x{{color:red}}</style>
</head><body>
<header>boilerplate header</header>
<nav><a href="/nav-should-be-cleaned">nav link</a></nav>
<div class="sidebar">sidebar junk</div>
<main>
<h1>Heading {idx}</h1>
<h2>Section {idx % 5}</h2>
{"".join(f"<p>{p}</p>" for p in paras)}
{"".join(link_html)}
<img src="/img/{idx}.png" alt="figure {idx}">
<ul>{items}</ul>
<ol><li>first</li><li>second</li></ol>
<pre><code class="language-python">{code}</code></pre>
<blockquote>quote for page {idx}</blockquote>
</main>
<footer>boilerplate footer</footer>
<div class="ad">buy things</div>
</body></html>"""
    text = " ".join(paras)
    return html, text


def generate_corpus(spec: Optional[CorpusSpec] = None) -> Corpus:
    spec = spec or CorpusSpec()
    rng = random.Random(spec.seed)
    hosts = _host_names(spec)
    counts = _page_counts(spec)

    urls_by_host = {h: [_page_url(h, i) for i in range(counts[h])] for h in hosts}
    all_urls = [u for h in hosts for u in urls_by_host[h]]

    rows: List[Tuple[str, datetime, bytes, str, str]] = []
    row_i = 0
    for h in hosts:
        n = counts[h]
        for i, url in enumerate(urls_by_host[h]):
            # deterministic out-link structure: chain + sibling + maybe cross
            out: List[str] = []
            if n > 1:
                out.append(urls_by_host[h][(i + 1) % n])  # chain (cycle at end)
                out.append(urls_by_host[h][(i * 7 + 3) % n])  # sibling mix
            if i % spec.cross_link_every == 0:
                other = hosts[(hosts.index(h) + 1 + i) % len(hosts)]
                out.append(urls_by_host[other][i % counts[other]])
            if i % spec.dead_link_every == 0:
                out.append(f"https://{h}/missing/dead-{i}")  # dead link
            out.append(f"/{url.split('/', 3)[3].rsplit('-', 1)[0]}-{(i * 3) % n}")

            lang = _LANGS[(i + hosts.index(h)) % len(_LANGS)]
            html, text = _make_html(rng, h, i, url, out, lang)
            ts = spec.base_ts + timedelta(seconds=row_i * 17)
            rows.append((url, ts, html.encode("utf-8"), text, lang))
            row_i += 1

        # robots.txt: disallow /private/ on every even-indexed host
        disallow = "Disallow: /private/\n" if hosts.index(h) % 2 == 0 else ""
        robots = (
            f"User-agent: *\n{disallow}\n"
            f"Sitemap: https://{h}/sitemap.xml\n"
        )
        rows.append(
            (
                f"https://{h}/robots.txt",
                spec.base_ts,
                robots.encode("utf-8"),
                robots,
                "en",
            )
        )
        # sitemap.xml listing the first 10 pages with priorities
        entries = "".join(
            f"<url><loc>{u}</loc><priority>{round(1.0 - 0.05 * k, 2)}</priority></url>"
            for k, u in enumerate(urls_by_host[h][:10])
        )
        sitemap = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            f"{entries}</urlset>"
        )
        rows.append(
            (
                f"https://{h}/sitemap.xml",
                spec.base_ts,
                sitemap.encode("utf-8"),
                sitemap,
                "en",
            )
        )

    seeds = [urls_by_host[h][0] for h in hosts]
    return Corpus(rows=rows, seeds=seeds, hosts=hosts)


def write_corpus_parquet(corpus: Corpus, path: str) -> None:
    """Write the pages table as parquet (Iceberg stand-in)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "url": [r[0] for r in corpus.rows],
            "warc_ts": pa.array([r[1] for r in corpus.rows], pa.timestamp("us", tz="UTC")),
            "html": pa.array([r[2] for r in corpus.rows], pa.binary()),
            "text": [r[3] for r in corpus.rows],
            "lang": [r[4] for r in corpus.rows],
        }
    )
    # small row groups: a parquet row group is the atomic parallelism unit
    # for readers — one giant group would serialize the whole scan into a
    # single Spark task regardless of split count
    pq.write_table(table, path, row_group_size=1024)
