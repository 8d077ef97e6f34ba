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


def exact_groups(signed: DataFrame, id_col: str = "conv_id") -> DataFrame:
    """Add ``exact_rep``: the minimum id sharing this row's content hash.

    Shuffle-narrow plan: a window over the full row would shuffle the wide
    signature payload (shingle + band arrays); instead aggregate the
    (content_sha, id) projection — map-side-combinable — and join the tiny
    (sha -> rep) map back.  Only hashes in duplicated groups are joined
    (dup maps are small relative to the corpus, so Catalyst/AQE broadcasts
    them); unique rows take ``coalesce(rep, id)``.
    """
    rep_map = (
        signed.select("content_sha", F.col(id_col))
        .groupBy("content_sha")
        .agg(F.min(id_col).alias("exact_rep"), F.count("*").alias("_sha_n"))
        .filter(F.col("_sha_n") > 1)
        .drop("_sha_n")
    )
    return signed.join(rep_map, "content_sha", "left").withColumn(
        "exact_rep", F.coalesce("exact_rep", F.col(id_col))
    )


def exact_edges(grouped: DataFrame, id_col: str = "conv_id") -> DataFrame:
    """Star edges (member -> representative) for non-representative rows."""
    return grouped.filter(F.col(id_col) != F.col("exact_rep")).select(
        F.col("exact_rep").alias("a_id"), F.col(id_col).alias("b_id")
    )


def representatives(grouped: DataFrame, id_col: str = "conv_id") -> DataFrame:
    """One row per distinct content hash (the LSH input at scale)."""
    return grouped.filter(F.col(id_col) == F.col("exact_rep"))
