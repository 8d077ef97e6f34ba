"""Extended operator coverage: sources, smart merge, disambiguation,
multimodal, rollup/window operators.

Source scans and UDF-heavy pipelines are rows-only for the driver (their
correctness gates live in pytest with reference-style golden fixtures);
the rollup/window entries carry exact DuckDB oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

DATA_DIR = "/root/repo/data"


# -- sources (rows-only; golden tests in tests/test_sources_sinks.py) --------

def s_wos_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bibexpy_spark.sources import wos

    path = os.path.join(DATA_DIR, "wos_sample.txt")
    wos.write_sample_wos(path, n_docs=25)
    return wos.read_wos_tagged(spark, path)


def s_scopus_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bibexpy_spark.sources import scopus

    paths = scopus.write_sample_scopus(os.path.join(DATA_DIR, "scopus_samples"))
    return scopus.read_scopus_csv(spark, paths)


def s_smart_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WoS sample x Scopus sample through the full Smart Merge in EXACT
    reference-parity mode (assignment='greedy', smart_merger.py:654-711);
    returns the merged table (stage + confidence + merged fields per matched
    pair).  Row ids are the natural DOI key (unique per side in the
    samples), so the golden pandas oracle reproduces them exactly."""
    from bibexpy_spark.operators import smart_merge as sm

    shared = ["AU", "TI", "SO", "PY", "DI", "TC"]
    wos_df = s_wos_scan(spark, sf_dir).select(*shared).withColumn(
        "_row_id", F.concat(F.lit("w"), F.col("DI"))
    )
    scp_df = s_scopus_scan(spark, sf_dir).select(*shared).withColumn(
        "_row_id", F.concat(F.lit("s"), F.col("DI"))
    )
    res = sm.run_smart_merge(wos_df, scp_df, assignment="greedy")
    return res["merged"]


def s_disambiguation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Author disambiguation proposals over the WoS sample."""
    from bibexpy_spark.operators import disambiguation as dis

    wos_df = s_wos_scan(spark, sf_dir).withColumn(
        "UID", F.concat_ws("_", "file", "doc_id")
    )
    res = dis.run_author_disambiguation(wos_df.select("UID", "AU"))
    return res["clusters"].select("record_id", "norm_name", "cluster_id", "tier")


def m_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: synthetic binary media -> fake-decoded features."""
    from bibexpy_spark.training import multimodal as mm

    media = mm.synthesize_media(spark, n=64)
    return mm.decode_features(media, fake=True).select(
        "media_id", "kind", "n_bytes", "content_sha"
    )


# -- rollup / window (with oracles) ------------------------------------------

def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup aggregation over orders, cross-joined with the
    approx-distinct metrics row (former q_approx_distinct: HLL sketches
    differ across engines by construction, so the oracle-checkable contract
    is the exact count plus a bounded-relative-error flag — Spark's HLL++
    guarantees rsd <= 0.05 by default)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    roll = (
        o.rollup(F.year("o_orderdate").alias("yr"), F.col("o_orderstatus").alias("st"))
        .agg(F.count("*").alias("n"))
    )
    approx = li.agg(
        F.approx_count_distinct("l_orderkey").alias("_approx"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    ).select(
        "exact_orders",
        (
            F.abs(F.col("_approx") - F.col("exact_orders"))
            <= 0.05 * F.col("exact_orders")
        ).alias("approx_within_5pct"),
    )
    return roll.crossJoin(approx)


def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = W.partitionBy("user_id").orderBy("event_id")
    return e.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 4).alias("running_value"),
        F.lag("event_type").over(w).alias("prev_type"),
    )


# -- entity standardization blocks (reference blocking.py:286-583) -----------

def _wos_with_uid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return s_wos_scan(spark, sf_dir).withColumn(
        "UID", F.concat_ws("_", "file", "doc_id")
    )


def q_c1_parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-address institution + country extraction (reference
    parse_c1_address, c1_utils.py:225-257: org-keyword scan, geographic
    strip, dictionary-gated country)."""
    from bibexpy_spark.functions import c1_address as c1

    wos_df = _wos_with_uid(spark, sf_dir)
    return c1.explode_addresses(
        wos_df.select("UID", F.col("C1raw").alias("C1")), "UID"
    ).select("UID", "addr_pos", "institution", "country")


def s_affiliation_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Affiliation-variant merge proposals (blocking.py:362-429)."""
    from bibexpy_spark.operators import entity_blocks as eb

    wos_df = _wos_with_uid(spark, sf_dir)
    out = eb.affiliation_blocks(wos_df.select("UID", F.col("C1raw").alias("C1")))
    return out.select(
        "block", "cluster_id", "tier", "min_jw",
        F.array_join("variants", "; ").alias("variants"),
        F.array_join("records", "; ").alias("records"),
    )


def s_author_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-disjoint author split proposals (blocking.py:286-359)."""
    from bibexpy_spark.operators import entity_blocks as eb

    wos_df = _wos_with_uid(spark, sf_dir)
    out = eb.author_split_proposals(wos_df.select("UID", "AU", "WC"))
    return out.select(
        "split_id", "name", "norm", "tier", "group_idx", "suffix",
        F.array_join("records", "; ").alias("records"),
        F.array_join("fields", "; ").alias("fields"),
    )


def q_country_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Country standardization proposals (blocking.py:429-513)."""
    from bibexpy_spark.operators import entity_blocks as eb

    wos_df = _wos_with_uid(spark, sf_dir)
    out = eb.country_blocks(wos_df.select("UID", F.col("C1raw").alias("C1")), "UID")
    return out.select(
        "tier", "canonical",
        F.array_join("variants", "; ").alias("variants"),
        "n_records",
    )


def q_org_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parent-institution rollup proposals (blocking.py:513-583)."""
    from bibexpy_spark.operators import entity_blocks as eb

    wos_df = _wos_with_uid(spark, sf_dir)
    out = eb.org_rollup_blocks(wos_df.select("UID", F.col("C1raw").alias("C1")), "UID")
    return out.select(
        "block", "cluster_id", "tier", "canonical_name",
        F.array_join("variants", "; ").alias("variants"),
        F.array_join("records", "; ").alias("records"),
    )


QUERIES = {
    "s_wos_scan": s_wos_scan,
    "s_scopus_scan": s_scopus_scan,
    "s_smart_merge": s_smart_merge,
    "s_disambiguation": s_disambiguation,
    "s_affiliation_blocks": s_affiliation_blocks,
    "s_author_splits": s_author_splits,
    "m_media_features": m_media_features,
    "q_c1_parsed": q_c1_parsed,
    "q_country_blocks": q_country_blocks,
    "q_org_rollup": q_org_rollup,
    "q_rollup": q_rollup,
    "q_running_sum": q_running_sum,
}

ORACLES = {
    "q_rollup": """
      SELECT yr, st, n, exact_orders, approx_within_5pct
      FROM (
        SELECT CAST(year(o_orderdate) AS INT) AS yr, o_orderstatus AS st,
               CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY ROLLUP (yr, st)
      )
      CROSS JOIN (
        SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
               TRUE AS approx_within_5pct
        FROM lineitem
      )
    """,
    "q_running_sum": """
      SELECT user_id, event_id,
             ROUND(sum(value) OVER (PARTITION BY user_id ORDER BY event_id), 4)
               AS running_value,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
               AS prev_type
      FROM events
    """,
}

# Golden-parquet oracles: independent pandas parsers / reference-semantics
# pandas pipelines in bibexpy_spark.golden precompute ground truth for the
# source scans and UDF-heavy pipelines; DuckDB reads the parquet back.
from bibexpy_spark import golden as _golden  # noqa: E402

ORACLES.update(
    {
        name: _golden.oracle_sql_for(name)
        for name in (
            "s_wos_scan",
            "s_scopus_scan",
            "s_smart_merge",
            "s_disambiguation",
            "s_affiliation_blocks",
            "s_author_splits",
            "m_media_features",
            "q_c1_parsed",
            "q_country_blocks",
            "q_org_rollup",
        )
    }
)
