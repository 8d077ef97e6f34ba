"""Exact-duplicate short-circuit (strong content hash).

The reference resolves most pairs with O(1) identifier equality before any
fuzzy similarity (Stage 1 DOI exact, smart_merger.py:253-265; v1 dup-group
join groupby('DI'), MergeDB.py:782-829).  The transcript analogue groups on
sha256 of the normalized document: members of one hash group are exact
duplicates; the group minimum becomes the representative that continues into
the MinHash/LSH path, shrinking the fuzzy workload by the duplication factor
— at 10^12 turns this is the single biggest pruning step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def exact_groups(signed: DataFrame, id_col: str = "conv_id") -> DataFrame:
    """Add ``exact_rep``: the minimum id sharing this row's content hash.

    One window over content_sha — a single shuffle, no join.
    """
    w = W.partitionBy("content_sha")
    return signed.withColumn("exact_rep", F.min(id_col).over(w))


def exact_edges(grouped: DataFrame, id_col: str = "conv_id") -> DataFrame:
    """Star edges (member -> representative) for non-representative rows."""
    return grouped.filter(F.col(id_col) != F.col("exact_rep")).select(
        F.col("exact_rep").alias("a_id"), F.col(id_col).alias("b_id")
    )


def representatives(grouped: DataFrame, id_col: str = "conv_id") -> DataFrame:
    """One row per distinct content hash (the LSH input at scale)."""
    return grouped.filter(F.col(id_col) == F.col("exact_rep"))
