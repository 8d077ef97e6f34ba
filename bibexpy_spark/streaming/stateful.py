"""Custom stateful streaming operator: first-seen exact dedup.

The driver brief's streaming contract (`applyInPandasWithState` for custom
stateful operators): an unbounded stream of documents is deduplicated ON THE
FLY — the first arrival of each content hash is emitted, every later
arrival is counted into per-key state and suppressed.  This is the streaming
analogue of the batch pipeline's Stage-1 exact short-circuit
(operators/exact.py): the state store replaces the groupBy, so the operator
never re-reads history.

State per content_sha: (seen flag, duplicate count).  At 10^12-turn scale
the state store is the right structure — it is partitioned by the grouping
key across executors, checkpointed with the query, and recovers exactly-once
on restart; no unbounded shuffle re-aggregation per micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("content_sha", T.StringType()),
        T.StructField("rep_id", T.StringType()),
        T.StructField("n_new_duplicates", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("seen", T.BooleanType()),
        T.StructField("dups", T.LongType()),
    ]
)


def _first_seen(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen, dups = state.get if state.exists else (False, 0)
    first_id = None
    new_dups = 0
    for pdf in pdfs:
        for rid in pdf["doc_id"]:
            if not seen:
                first_id = rid
                seen = True
            else:
                new_dups += 1
    state.update((seen, dups + new_dups))
    if first_id is not None or new_dups:
        yield pd.DataFrame(
            {
                "content_sha": [key[0]],
                "rep_id": [first_id],
                "n_new_duplicates": [new_dups],
            }
        )


def first_seen_dedup(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Streaming DataFrame of documents -> first-seen rows per content hash.

    Emits (content_sha, rep_id, n_new_duplicates) per key per micro-batch
    that touches the key; rep_id is non-null only on the batch where the key
    first appears — downstream keeps `rep_id IS NOT NULL` for the deduped
    stream and sums n_new_duplicates for the dup metric.
    """
    hashed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.sha2(F.col(text_col).cast("string"), 256).alias("content_sha"),
    )
    return hashed.groupBy("content_sha").applyInPandasWithState(
        _first_seen,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
