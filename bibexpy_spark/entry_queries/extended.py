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
    """WoS sample x Scopus sample through the full Smart Merge; returns the
    match audit (stage + confidence per matched pair)."""
    from bibexpy_spark.operators import smart_merge as sm

    wos_df = s_wos_scan(spark, sf_dir)
    scp_df = s_scopus_scan(spark, sf_dir)
    shared = ["AU", "TI", "SO", "PY", "DI", "TC"]
    res = sm.run_smart_merge(wos_df.select(*shared), scp_df.select(*shared))
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


def q_c1_countries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 parsing -> country counts over a deterministic synthetic C1 set."""
    from bibexpy_spark.functions import c1_address as c1

    wos_df = s_wos_scan(spark, sf_dir).withColumn(
        "UID", F.concat_ws("_", "file", "doc_id")
    )
    return c1.country_counts(wos_df.select("UID", "C1raw").withColumnRenamed("C1raw", "C1"), "UID")


# -- rollup / window (with oracles) ------------------------------------------

def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        o.rollup(F.year("o_orderdate").alias("yr"), F.col("o_orderstatus").alias("st"))
        .agg(F.count("*").alias("n"))
    )


def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = W.partitionBy("user_id").orderBy("event_id")
    return e.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 4).alias("running_value"),
        F.lag("event_type").over(w).alias("prev_type"),
    )


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (metrics path at 10^12 scale) — rows-only:
    HLL sketches differ across engines by construction."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )


QUERIES = {
    "s_wos_scan": s_wos_scan,
    "s_scopus_scan": s_scopus_scan,
    "s_smart_merge": s_smart_merge,
    "s_disambiguation": s_disambiguation,
    "m_media_features": m_media_features,
    "q_c1_countries": q_c1_countries,
    "q_rollup": q_rollup,
    "q_running_sum": q_running_sum,
    "q_approx_distinct": q_approx_distinct,
}

ORACLES = {
    "q_rollup": """
      SELECT CAST(year(o_orderdate) AS INT) AS yr, o_orderstatus AS st,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY ROLLUP (yr, st)
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
