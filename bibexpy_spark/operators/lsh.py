"""LSH candidate-pair generation with explicit hot-band (skew) handling.

The reference's blocking join (smart_merger.py:185-198, 624-655) has a known
skew hazard: rows with empty keys pile into one block.  At LSH scale the
analogue is a hot band bucket (boilerplate text shared by millions of rows).
Policy here (SURVEY.md §4, §7.4 #2):

  * buckets with <= ``hot_band_cap`` members generate ALL intra-bucket pairs
    via a self-equi-join on (band_idx, band_hash) — AQE skew-join splits any
    moderately large bucket's join tasks;
  * buckets larger than the cap switch to a STAR pattern: every member pairs
    with the bucket minimum only (n-1 pairs instead of n(n-1)/2).  For
    connected-components clustering this preserves connectivity through the
    representative while bounding pair volume; the switch is recorded in the
    metrics output — truncation is never silent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bibexpy_spark.config import DedupConfig


def explode_bands(signed: DataFrame, id_col: str = "conv_id") -> DataFrame:
    """(id, band_hashes array) -> (id, band_idx, band_hash), one row per band."""
    return signed.select(
        id_col, F.posexplode("band_hashes").alias("band_idx", "band_hash")
    )


def candidate_pairs(
    signed: DataFrame, cfg: DedupConfig, id_col: str = "conv_id"
) -> tuple[DataFrame, DataFrame]:
    """LSH band join -> distinct candidate pairs (a_id < b_id).

    Returns (pairs, band_stats); band_stats carries per-bucket member counts
    and the hot/star flag for the metrics table.
    """
    ex = explode_bands(signed, id_col)

    bucket_sizes = ex.groupBy("band_idx", "band_hash").agg(
        F.count("*").alias("bucket_n"), F.min(id_col).alias("bucket_rep")
    )
    # Buckets of size 1 generate no pairs — drop their rows before the join
    # (the overwhelming majority at scale; this is the big pruning step).
    # Persist: ex2 feeds both the small-bucket self-join (twice) and the
    # hot-bucket star path; without it the band explode + bucket-size join
    # recompute 3-4x.
    ex2 = ex.join(
        bucket_sizes.filter(F.col("bucket_n") >= 2), ["band_idx", "band_hash"]
    ).persist()

    small = ex2.filter(F.col("bucket_n") <= cfg.hot_band_cap)
    hot = ex2.filter(F.col("bucket_n") > cfg.hot_band_cap)

    a = small.select(
        "band_idx", "band_hash", F.col(id_col).alias("a_id")
    )
    b = small.select(
        "band_idx", "band_hash", F.col(id_col).alias("b_id")
    )
    small_pairs = a.join(b, ["band_idx", "band_hash"]).filter(
        F.col("a_id") < F.col("b_id")
    )

    hot_pairs = hot.filter(F.col(id_col) != F.col("bucket_rep")).select(
        "band_idx",
        "band_hash",
        F.least(id_col, "bucket_rep").alias("a_id"),
        F.greatest(id_col, "bucket_rep").alias("b_id"),
    )

    pairs = (
        small_pairs.select("a_id", "b_id")
        .unionByName(hot_pairs.select("a_id", "b_id"))
        .dropDuplicates(["a_id", "b_id"])
    )

    band_stats = bucket_sizes.filter(F.col("bucket_n") >= 2).select(
        "band_idx",
        "band_hash",
        "bucket_n",
        (F.col("bucket_n") > cfg.hot_band_cap).alias("star_mode"),
    )
    return pairs, band_stats
