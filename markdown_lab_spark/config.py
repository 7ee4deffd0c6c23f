"""Engine configuration: validated knobs with environment overrides.

Spark-first re-expression of MarkdownLabConfig
(markdown_lab/core/config.py:20-151: ~25 validated scalar knobs,
MARKDOWN_LAB_* env overrides, from_dict). Knobs that configured the
reference's single-process machinery (connection pools, thread counts,
cache byte quotas) map onto their cluster equivalents — shuffle
partitioning, Arrow batch sizing, bloom/cuckoo sharding, wave politeness
— or are intentionally absent because Spark owns that concern.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, fields
from typing import Any, Dict, Optional

from .errors import ConfigurationError

_ENV_PREFIX = "MARKDOWN_LAB_SPARK_"


def _bool(x: str) -> bool:
    return x.lower() in ("true", "1", "yes")


@dataclass
class EngineConfig:
    # politeness / crawl control (reference: requests_per_second=1.0,
    # max_retries=3, config.py:30-33)
    rps: float = 1.0
    wave_seconds: int = 10
    max_waves: int = 100
    max_retries: int = 3
    # TTL re-crawl (reference cache_ttl=3600 s, config.py:51)
    ttl_waves: Optional[int] = None

    # chunking (reference chunk_size=1000 / chunk_overlap=200)
    chunk_size: int = 1000
    chunk_overlap: int = 200

    # document limits (reference max_file_size=10MB, config.py:44)
    max_file_size: int = 10_000_000

    # output (reference default_output_format / include_metadata)
    default_output_format: str = "markdown"
    include_metadata: bool = True
    user_agent: str = "MarkdownLabSpark/1.0 (PySpark)"

    # URL-seen state (cluster equivalents of the two-level cache)
    bloom_shards: int = 8
    bloom_capacity_per_shard: int = 1 << 17
    bloom_fpr: float = 0.01
    cuckoo_capacity: int = 1 << 18

    # skew / shuffle shape
    salt_n: int = 16
    shuffle_partitions: int = 64
    arrow_batch_size: int = 8000
    max_partition_bytes: int = 2 << 20

    # state
    checkpoint_dir: Optional[str] = None
    # co-located state joins (exchange-free per-wave anti-join; needs
    # checkpoint_dir — the bucketed tables are the checkpoint format)
    bucketed_state: bool = False
    state_buckets: int = 16
    # seen-delta compaction cadence (None disables); see CrawlConfig
    seen_compact_every: Optional[int] = 8

    def __post_init__(self) -> None:
        self._apply_environment_overrides()
        self._validate()

    # -- validation (mirrors config.py:76-117's rule set) ---------------------
    def _validate(self) -> None:
        def positive(name: str) -> None:
            if getattr(self, name) <= 0:
                raise ConfigurationError(
                    f"{name} must be positive", error_code="CONFIG_INVALID"
                )

        for name in (
            "rps", "wave_seconds", "max_waves", "chunk_size", "max_file_size",
            "bloom_shards", "bloom_capacity_per_shard", "cuckoo_capacity",
            "salt_n", "shuffle_partitions", "arrow_batch_size",
            "max_partition_bytes", "state_buckets",
        ):
            positive(name)
        if self.seen_compact_every is not None and self.seen_compact_every <= 0:
            raise ConfigurationError(
                "seen_compact_every must be positive or None",
                error_code="CONFIG_INVALID",
            )
        if self.max_retries < 0:
            raise ConfigurationError(
                "max_retries cannot be negative", error_code="CONFIG_INVALID"
            )
        if self.chunk_overlap < 0:
            raise ConfigurationError(
                "chunk_overlap cannot be negative", error_code="CONFIG_INVALID"
            )
        if self.chunk_overlap >= self.chunk_size:
            raise ConfigurationError(
                "chunk_overlap must be less than chunk_size",
                error_code="CONFIG_INVALID",
            )
        if not (0.0 < self.bloom_fpr < 1.0):
            raise ConfigurationError(
                "bloom_fpr must be in (0, 1)", error_code="CONFIG_INVALID"
            )
        if self.ttl_waves is not None and self.ttl_waves <= 0:
            raise ConfigurationError(
                "ttl_waves must be positive when set", error_code="CONFIG_INVALID"
            )
        if self.ttl_waves is not None and self.bucketed_state:
            raise ConfigurationError(
                "bucketed_state and ttl_waves are mutually exclusive: the "
                "TTL path uses the cuckoo-filter seen set and never reads "
                "the bucketed state tables",
                error_code="CONFIG_INVALID",
            )
        if self.default_output_format not in ("markdown", "json", "xml"):
            raise ConfigurationError(
                "default_output_format must be 'markdown', 'json', or 'xml'",
                error_code="CONFIG_INVALID",
            )

    # -- env overrides (reference config.py:119-151) ---------------------------
    def _apply_environment_overrides(self) -> None:
        casts = {
            "rps": float, "bloom_fpr": float,
            "include_metadata": _bool, "bucketed_state": _bool,
            "default_output_format": str, "user_agent": str,
            "checkpoint_dir": str,
        }
        for f in fields(self):
            env_var = _ENV_PREFIX + f.name.upper()
            raw = os.getenv(env_var)
            if raw is None:
                continue
            cast = casts.get(f.name, int)
            try:
                setattr(self, f.name, cast(raw))
            except (TypeError, ValueError) as exc:
                raise ConfigurationError(
                    f"invalid environment variable {env_var}={raw}: {exc}",
                    error_code="CONFIG_INVALID",
                    details={"env_var": env_var, "value": raw},
                ) from exc

    # -- adapters ---------------------------------------------------------------
    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "EngineConfig":
        known = {f.name for f in fields(cls)}
        unknown = set(d) - known
        if unknown:
            raise ConfigurationError(
                f"unknown config keys: {sorted(unknown)}",
                error_code="CONFIG_INVALID",
            )
        return cls(**d)

    def to_crawl_config(self):
        """Adapter to the wave engine's CrawlConfig."""
        from .frontier.crawler import CrawlConfig  # noqa: PLC0415

        return CrawlConfig(
            rps=self.rps,
            wave_seconds=self.wave_seconds,
            max_waves=self.max_waves,
            bloom_shards=self.bloom_shards,
            bloom_capacity_per_shard=self.bloom_capacity_per_shard,
            bloom_fpr=self.bloom_fpr,
            salt_n=self.salt_n,
            chunk_size=self.chunk_size,
            chunk_overlap=self.chunk_overlap,
            max_retries=self.max_retries,
            ttl_waves=self.ttl_waves,
            cuckoo_capacity=self.cuckoo_capacity,
            max_file_size=self.max_file_size,
            bucketed_state=self.bucketed_state,
            state_buckets=self.state_buckets,
            seen_compact_every=self.seen_compact_every,
        )

    def spark_conf(self) -> Dict[str, str]:
        """Session settings the engine's plans are tuned for."""
        return {
            "spark.sql.shuffle.partitions": str(self.shuffle_partitions),
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.execution.arrow.pyspark.enabled": "true",
            "spark.sql.execution.arrow.maxRecordsPerBatch": str(
                self.arrow_batch_size
            ),
            "spark.sql.files.maxPartitionBytes": str(self.max_partition_bytes),
        }
