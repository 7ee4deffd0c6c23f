"""Command-line surface: Spark-first twin of the reference's `mlab` CLI.

The reference ships `mlab convert <url>`, `mlab sitemap <url>`,
`mlab batch <file>` (markdown_lab/cli.py:118-225, Typer). This CLI keeps
the same verbs — plus `crawl` for the wave engine — but every command is
a Spark job over the pages corpus (the network stand-in per the north
rule), driven by a validated EngineConfig with MARKDOWN_LAB_SPARK_* env
overrides. Run as:

    spark-submit --py-files dist/engine.zip -m markdown_lab_spark.cli ...
    python -m markdown_lab_spark.cli convert https://h/x --pages corpus.parquet
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import List, Optional

from .config import EngineConfig


def _spark(cfg: EngineConfig, app: str):
    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName(f"markdown_lab_spark-{app}")
    if not SparkSession.getActiveSession():
        b = b.master("local[*]")
    for k, v in cfg.spark_conf().items():
        b = b.config(k, v)
    return b.getOrCreate()


def _convert_docs(spark, cfg: EngineConfig, pages, urls: Optional[List[str]]):
    from pyspark.sql import functions as F

    from .functions.udfs import convert_html_udf, normalize_url_col

    src = pages.withColumn("canon_url", normalize_url_col(F.col("url")))
    if urls:
        wanted = spark.createDataFrame(
            [(u,) for u in urls], "url string"
        ).select(normalize_url_col(F.col("url")).alias("canon_url"))
        src = src.join(F.broadcast(wanted), on="canon_url", how="inner")
    return src.filter(F.length("html") <= cfg.max_file_size).withColumn(
        "doc", convert_html_udf(F.col("html"), F.col("url"))
    ).select(
        "url",
        F.col("doc.title").alias("title"),
        F.col("doc.markdown").alias("markdown"),
        F.col("doc.json").alias("json"),
        F.col("doc.xml").alias("xml"),
        F.col("doc.status").alias("status"),
        F.col("doc.error").alias("error"),
    )


def cmd_convert(args, cfg: EngineConfig) -> int:
    """`mlab convert <url>` twin: convert one URL from the corpus."""
    from .sinks import export_content_files

    spark = _spark(cfg, "convert")
    pages = spark.read.parquet(args.pages)
    docs = _convert_docs(spark, cfg, pages, [args.url])
    n = export_content_files(docs, args.output, args.format)
    print(json.dumps({"converted": n, "output_dir": args.output}))
    return 0 if n else 1


def cmd_sitemap(args, cfg: EngineConfig) -> int:
    """`mlab sitemap <base-url>` twin: discover via robots/sitemap, filter
    (F6-F8), convert the selected pages."""
    from .sinks import export_content_files
    from .sources.seeds import discover_sitemap_seeds

    spark = _spark(cfg, "sitemap")
    pages = spark.read.parquet(args.pages)
    seeds = discover_sitemap_seeds(
        pages,
        args.base_url,
        min_priority=args.min_priority,
        include_patterns=args.include or None,
        exclude_patterns=args.exclude or None,
        limit=args.limit,
    )
    urls = [u.loc for u in seeds]
    if not urls:
        print(json.dumps({"converted": 0, "reason": "no sitemap urls"}))
        return 1
    docs = _convert_docs(spark, cfg, pages, urls)
    n = export_content_files(docs, args.output, args.format)
    print(json.dumps({"discovered": len(urls), "converted": n}))
    return 0


def cmd_batch(args, cfg: EngineConfig) -> int:
    """`mlab batch <links-file>` twin: convert every listed URL."""
    from .sinks import export_content_files
    from .sources.seeds import read_links_file

    spark = _spark(cfg, "batch")
    pages = spark.read.parquet(args.pages)
    urls = read_links_file(spark, args.links_file)
    docs = _convert_docs(spark, cfg, pages, urls)
    n = export_content_files(docs, args.output, args.format)
    print(json.dumps({"requested": len(urls), "converted": n}))
    return 0


def cmd_crawl(args, cfg: EngineConfig) -> int:
    """Wave-engine crawl from seeds (the engine's own surface)."""
    from pyspark.sql import functions as F

    from .frontier.crawler import CrawlEngine
    from .sinks import write_chunks_jsonl, write_docs_table
    from .sources.seeds import read_links_file

    spark = _spark(cfg, "crawl")
    pages = spark.read.parquet(args.pages)
    seeds = read_links_file(spark, args.links_file)
    engine = CrawlEngine(
        spark, pages, cfg.to_crawl_config(), checkpoint_dir=cfg.checkpoint_dir
    )
    out = engine.crawl(seeds, resume=args.resume, from_wave=args.from_wave)
    if args.evict_to_bytes is not None and cfg.checkpoint_dir:
        from .frontier.crawler import evict_checkpoints  # noqa: PLC0415

        evict_checkpoints(cfg.checkpoint_dir, args.evict_to_bytes)
    stats = {
        r["status"]: r["n"]
        for r in out["trace"]
        .groupBy("status")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    if args.output:
        write_docs_table(out["trace"], f"{args.output}/trace")
        write_chunks_jsonl(out["chunks"], f"{args.output}/chunks")
    print(json.dumps({"trace": stats}))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="markdown_lab_spark",
        description="PySpark-native crawl/convert engine (markdown_lab twin)",
    )
    p.add_argument("--config", type=json.loads, default={},
                   help="EngineConfig overrides as a JSON object")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, output=True):
        sp.add_argument("--pages", required=True, help="pages corpus parquet")
        if output:
            sp.add_argument("-o", "--output", default="output")
        sp.add_argument("-f", "--format", default="markdown",
                        choices=["markdown", "json", "xml"])

    c = sub.add_parser("convert", help="convert one URL")
    c.add_argument("url")
    common(c)
    c.set_defaults(fn=cmd_convert)

    s = sub.add_parser("sitemap", help="sitemap-driven discovery + convert")
    s.add_argument("base_url")
    common(s)
    s.add_argument("--min-priority", type=float, default=None)
    s.add_argument("--include", action="append", default=[])
    s.add_argument("--exclude", action="append", default=[])
    s.add_argument("--limit", type=int, default=None)
    s.set_defaults(fn=cmd_sitemap)

    b = sub.add_parser("batch", help="convert URLs from a links file")
    b.add_argument("links_file")
    common(b)
    b.set_defaults(fn=cmd_batch)

    cr = sub.add_parser("crawl", help="wave-engine crawl from seed links")
    cr.add_argument("links_file")
    cr.add_argument("--pages", required=True)
    cr.add_argument("-o", "--output", default=None)
    cr.add_argument("--resume", action="store_true")
    cr.add_argument("--from-wave", type=int, default=None,
                    help="resume from this wave snapshot (time travel)")
    cr.add_argument("--evict-to-bytes", type=int, default=None,
                    help="after the crawl, evict oldest waves' bulk "
                         "artifacts until the checkpoint dir fits this")
    cr.set_defaults(fn=cmd_crawl)
    return p


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    cfg = EngineConfig.from_dict(args.config)
    return args.fn(args, cfg)


if __name__ == "__main__":
    sys.exit(main())
