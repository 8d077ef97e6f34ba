"""SimHash Hamming-bucket matching (fuzzy-field dedup pass).

The reference's Stage-4 matches on fuzzy secondary fields (journal JW >= 0.90
plus exact volume/page, smart_merger.py:309-334).  The transcript analogue:
SimHash over text + role/tool-sequence features, pairs within Hamming
distance ``simhash_hamming_max``.

Candidate generation uses the pigeonhole principle: split the 64-bit hash
into ``simhash_chunks`` chunks; two hashes within distance d < chunks must
agree exactly on at least one chunk -> one equi-join per chunk index, then a
JVM-native verify ``bit_count(a ^ b) <= d`` (no Python in the join path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bibexpy_spark.config import DedupConfig
from bibexpy_spark.functions import udfs


def with_simhash(conversations: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Add ``simhash`` over the normalized (doc + roles + tools) feature.

    The intermediate normalized feature is dropped before returning (r4
    review: leaving it aboard put a second full-text copy of every
    conversation into the pipeline's persisted ``signed``/``grouped``
    frames and every downstream shuffle, and nothing ever read it)."""
    u = udfs.for_config(cfg)
    feat = F.concat_ws(
        " ", F.col("doc"), F.coalesce("roles", F.lit("")), F.coalesce("tools", F.lit(""))
    )
    return (
        conversations.withColumn("fuzzy_feat", u["normalize"](feat))
        .withColumn("simhash", u["simhash"](F.col("fuzzy_feat")))
        .drop("fuzzy_feat")
    )


def _chunked(simmed: DataFrame, cfg: DedupConfig, id_col: str) -> DataFrame:
    """Explode each 64-bit simhash into (chunk_idx, chunk_val) rows."""
    width = 64 // cfg.simhash_chunks
    mask = (1 << width) - 1
    return simmed.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_idx"),
                        F.shiftrightunsigned("simhash", i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk_val"),
                    )
                    for i in range(cfg.simhash_chunks)
                ]
            )
        ).alias("c"),
    ).select(id_col, "simhash", F.col("c.chunk_idx"), F.col("c.chunk_val"))


def simhash_pairs(simmed: DataFrame, cfg: DedupConfig, id_col: str = "conv_id") -> DataFrame:
    """(id, simhash) -> pairs (a_id, b_id, hamming) within the radius."""
    chunks = _chunked(simmed, cfg, id_col)

    a = chunks.select(
        F.col(id_col).alias("a_id"), F.col("simhash").alias("a_sim"), "chunk_idx", "chunk_val"
    )
    b = chunks.select(
        F.col(id_col).alias("b_id"), F.col("simhash").alias("b_sim"), "chunk_idx", "chunk_val"
    )
    return (
        a.join(b, ["chunk_idx", "chunk_val"])
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("hamming", F.bit_count(F.col("a_sim").bitwiseXOR(F.col("b_sim"))))
        .filter(F.col("hamming") <= cfg.simhash_hamming_max)
        .select("a_id", "b_id", "hamming")
        .dropDuplicates(["a_id", "b_id"])
    )


def simhash_pairs_delta(
    old_simmed: DataFrame,
    new_simmed: DataFrame,
    cfg: DedupConfig,
    id_col: str = "conv_id",
) -> DataFrame:
    """Delta-driven SimHash pass (incremental mode, r4): pairs within the
    Hamming radius with >= 1 endpoint in ``new_simmed``.  Old-old pairs live
    in the prior pair state;

        prior_pairs(minus pairs touching re-signed ids) ∪ delta_pairs
            == simhash_pairs(old ∪ new).

    Only chunk buckets containing a new row enter the join (semi-join
    pruning) — cost O(|delta| + touched buckets), never O(|corpus|)."""
    allc = (
        _chunked(old_simmed.select(id_col, "simhash"), cfg, id_col)
        .withColumn("_is_new", F.lit(False))
        .unionByName(
            _chunked(new_simmed.select(id_col, "simhash"), cfg, id_col)
            .withColumn("_is_new", F.lit(True))
        )
    )
    new_buckets = (
        allc.filter(F.col("_is_new")).select("chunk_idx", "chunk_val").distinct()
    )
    active = allc.join(new_buckets, ["chunk_idx", "chunk_val"], "left_semi")
    a = active.select(
        F.col(id_col).alias("a_id"), F.col("simhash").alias("a_sim"),
        F.col("_is_new").alias("_a_new"), "chunk_idx", "chunk_val",
    )
    b = active.select(
        F.col(id_col).alias("b_id"), F.col("simhash").alias("b_sim"),
        F.col("_is_new").alias("_b_new"), "chunk_idx", "chunk_val",
    )
    return (
        a.join(b, ["chunk_idx", "chunk_val"])
        .filter((F.col("a_id") < F.col("b_id")) & (F.col("_a_new") | F.col("_b_new")))
        .withColumn("hamming", F.bit_count(F.col("a_sim").bitwiseXOR(F.col("b_sim"))))
        .filter(F.col("hamming") <= cfg.simhash_hamming_max)
        .select("a_id", "b_id", "hamming")
        .dropDuplicates(["a_id", "b_id"])
    )
