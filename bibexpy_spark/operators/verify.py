"""Candidate-pair verification: exact Jaccard on shingle sets, JVM-side.

The reference verifies candidates with staged predicates over normalized
fields (compute_match, smart_merger.py:243-350); the north rule replaces
Jaro-Winkler with exact Jaccard on k-shingle sets at a fixed threshold.

Negative rules run FIRST (cheap equality on strong ids rejects a pair before
any set arithmetic), mirroring negative_rule_check (smart_merger.py:205-240)
— two records that both carry a strong identifier with different values can
never match, and never reach the fuzzy path.

The Jaccard itself is computed with built-in array functions
(``array_intersect`` / set sizes), staying inside whole-stage codegen —
no Python in the verification hot path at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bibexpy_spark.config import DedupConfig


def verify_pairs(
    pairs: DataFrame,
    signed: DataFrame,
    cfg: DedupConfig,
    id_col: str = "conv_id",
    strong_id_col: str | None = None,
) -> DataFrame:
    """pairs(a_id, b_id) x signed(id, shingles[, strong_id]) -> verified pairs.

    Output: a_id, b_id, inter, union_n, jaccard (double), is_dup (bool).
    Threshold comparison is integer cross-multiplication, not float, so the
    result is bit-exact reproducible: inter/union >= t  <=>
    inter * denom >= num * union for t = num/denom.
    """
    cols = [F.col(id_col), F.col("shingles"), F.size("shingles").alias("sh_n")]
    if strong_id_col:
        cols.append(F.col(strong_id_col).alias("strong_id"))
    side = signed.select(*cols)

    a = side.select(
        F.col(id_col).alias("a_id"),
        F.col("shingles").alias("a_sh"),
        F.col("sh_n").alias("a_n"),
        *([F.col("strong_id").alias("a_strong")] if strong_id_col else []),
    )
    b = side.select(
        F.col(id_col).alias("b_id"),
        F.col("shingles").alias("b_sh"),
        F.col("sh_n").alias("b_n"),
        *([F.col("strong_id").alias("b_strong")] if strong_id_col else []),
    )
    j = pairs.join(a, "a_id").join(b, "b_id")

    if strong_id_col:
        # negative rule: both sides identified, ids differ -> reject early
        j = j.filter(
            ~(
                F.col("a_strong").isNotNull()
                & F.col("b_strong").isNotNull()
                & (F.col("a_strong") != F.col("b_strong"))
            )
        )

    # size-ratio prefilter: jaccard <= min/max; skip pairs that cannot reach
    # the threshold before touching array_intersect (cheap int compare).
    t_num, t_den = _threshold_fraction(cfg.jaccard_threshold)
    j = j.filter(
        F.least("a_n", "b_n") * t_den >= F.greatest("a_n", "b_n") * t_num
    )

    j = j.withColumn("inter", F.size(F.array_intersect("a_sh", "b_sh")))
    j = j.withColumn("union_n", F.col("a_n") + F.col("b_n") - F.col("inter"))
    j = j.withColumn("jaccard", F.col("inter") / F.col("union_n"))
    j = j.withColumn("is_dup", F.col("inter") * t_den >= F.col("union_n") * t_num)
    return j.select("a_id", "b_id", "inter", "union_n", "jaccard", "is_dup")


def _threshold_fraction(t: float, max_den: int = 10_000) -> tuple[int, int]:
    """Exact small fraction for a threshold like 0.8 -> (4, 5)."""
    from fractions import Fraction

    fr = Fraction(t).limit_denominator(max_den)
    return fr.numerator, fr.denominator
