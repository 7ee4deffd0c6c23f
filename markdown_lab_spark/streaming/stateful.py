"""Custom stateful streaming operators (applyInPandasWithState).

Two streaming analogues of the batch crawl's state:

- ``first_seen_filter``: streaming URL-seen dedup — emits only the first
  occurrence of each canon_url per host group, keeping a per-host seen set
  in GroupState (the streaming counterpart of the batch bloom+anti-join).
- ``host_rate_monitor``: running per-host fetch totals (politeness
  accounting) with a per-batch delta.

State is partitioned by host — the same key the batch engine partitions
on — so hot-host skew handling carries over (state shards by key).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

FIRST_SEEN_OUTPUT = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("canon_url", T.StringType()),
    ]
)
FIRST_SEEN_STATE = T.StructType([T.StructField("seen", T.ArrayType(T.StringType()))])

RATE_OUTPUT = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("batch_count", T.LongType()),
        T.StructField("total_count", T.LongType()),
    ]
)
RATE_STATE = T.StructType([T.StructField("total", T.LongType())])


def _first_seen_fn(
    key: Tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (host,) = key
    seen = set(state.get[0]) if state.exists else set()
    out = []
    for pdf in batches:
        for url in pdf["canon_url"]:
            if url not in seen:
                seen.add(url)
                out.append(url)
    state.update((list(seen),))
    yield pd.DataFrame({"host": [host] * len(out), "canon_url": out})


def first_seen_filter(pages: DataFrame) -> DataFrame:
    """Streaming dedup: first occurrence of each canon_url per host.

    NOTE on scale: GroupState holds each host's seen set; for 10^10 URLs
    the state value would be a serialized bloom shard (bytes) instead of
    the exact list — same operator shape, constant-size state.
    """
    return pages.groupBy("host").applyInPandasWithState(
        _first_seen_fn,
        outputStructType=FIRST_SEEN_OUTPUT,
        stateStructType=FIRST_SEEN_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _rate_fn(
    key: Tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (host,) = key
    total = state.get[0] if state.exists else 0
    batch_n = 0
    for pdf in batches:
        batch_n += len(pdf)
    total += batch_n
    state.update((total,))
    yield pd.DataFrame(
        {"host": [host], "batch_count": [batch_n], "total_count": [total]}
    )


def host_rate_monitor(pages: DataFrame) -> DataFrame:
    """Running per-host fetch totals (politeness accounting)."""
    return pages.groupBy("host").applyInPandasWithState(
        _rate_fn,
        outputStructType=RATE_OUTPUT,
        stateStructType=RATE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
