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
    cols = [F.col(id_col).alias("id"), F.col("shingles"),
            F.size("shingles").alias("sh_n")]
    if strong_id_col:
        cols.append(F.col(strong_id_col).alias("strong_id"))
    side = signed.select(*cols)

    # explode-join-regroup (same shape as ngram.verify_gram_pairs, r3): the
    # shingle arrays cross exactly TWO exchanges — side by id, the fetched
    # pair rows by (a_id, b_id) — instead of the naive cand ⋈ rows ⋈ rows
    # chain that re-shuffles the array-carrying intermediate on b_id.
    need = pairs.select(
        "a_id", "b_id",
        F.explode(F.array(F.col("a_id"), F.col("b_id"))).alias("id"),
    )
    fetched = need.join(side, "id")
    is_a = (F.col("id") == F.col("a_id")).cast("int")
    aggs = [
        # endpoint-coverage guard (ADVICE r3, refined r4): a pair whose
        # endpoint is missing from ``signed`` must be DROPPED, not verified
        # against a single fetched row (max_by/min_by would return the same
        # row for both sides -> self-Jaccard 1.0, a false duplicate).
        # Presence per SIDE, not a row count of 2: a duplicate id in
        # ``signed`` (a caller bug) must not silently drop the pair
        F.sum(is_a).alias("_na"),
        F.sum(F.lit(1) - is_a).alias("_nb"),
        F.max_by("shingles", is_a).alias("a_sh"),
        F.min_by("shingles", is_a).alias("b_sh"),
        F.max_by("sh_n", is_a).alias("a_n"),
        F.min_by("sh_n", is_a).alias("b_n"),
    ]
    if strong_id_col:
        aggs += [
            F.max_by("strong_id", is_a).alias("a_strong"),
            F.min_by("strong_id", is_a).alias("b_strong"),
        ]
    j = (
        fetched.groupBy("a_id", "b_id")
        .agg(*aggs)
        .filter((F.col("_na") >= 1) & (F.col("_nb") >= 1))
    )

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
    # try_divide: under ANSI mode (Spark 4 default) 0/0 is a hard job
    # failure; an empty-vs-empty pair must instead surface as jaccard NULL
    # with is_dup false (guard below)
    j = j.withColumn("jaccard", F.try_divide(F.col("inter"), F.col("union_n")))
    # union_n > 0: two EMPTY shingle sets would otherwise pass 0 >= 0 with
    # a NULL jaccard — an undefined similarity must never read as a dup
    j = j.withColumn(
        "is_dup",
        (F.col("union_n") > 0)
        & (F.col("inter") * t_den >= F.col("union_n") * t_num),
    )
    return j.select("a_id", "b_id", "inter", "union_n", "jaccard", "is_dup")


def _threshold_fraction(t: float, max_den: int = 10_000) -> tuple[int, int]:
    """Exact small fraction for a threshold like 0.8 -> (4, 5)."""
    from fractions import Fraction

    fr = Fraction(t).limit_denominator(max_den)
    return fr.numerator, fr.denominator
