"""Relational operator coverage over the driver's TPC-H-ish tables.

One query per operator family from SURVEY.md §2 (filter engine
filter_engine.py:86-211, facets :219-247, quality stats quality.py:59-287,
merge aggregations MergeDB.py:14-61, blocking/anti joins
smart_merger.py:185-198,738-744) — each with an exactly-matching DuckDB
oracle.  All Spark implementations are pure DataFrame/SQL expressions
(JVM-side, Catalyst-optimizable; filters and projections push down to the
parquet scans)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# -- filters (reference filter_engine.py) -----------------------------------

def q_range_filter(spark, sf_dir):
    """Numeric + date range filter (_apply_range, filter_engine.py:86-96)."""
    o = _t(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_totalprice") >= 100000)
        & (F.col("o_totalprice") <= 150000)
        & (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") <= "1996-12-31")
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")


def q_set_membership(spark, sf_dir):
    """Upper-trimmed isin (_apply_in, filter_engine.py:99-104)."""
    o = _t(spark, sf_dir, "orders")
    return o.filter(
        F.upper(F.trim(F.col("o_orderpriority"))).isin("1-URGENT", "2-HIGH")
    ).select("o_orderkey", "o_orderpriority")


def q_contains_any(spark, sf_dir):
    """Contains-any over text (_apply_contains_any, filter_engine.py:107-116)."""
    d = _t(spark, sf_dir, "documents")
    lowered = F.lower(F.col("text"))
    return d.filter(
        lowered.contains("data") | lowered.contains("model")
    ).select("doc_id", "lang", "source")


def q_fulltext_bool(spark, sf_dir):
    """Boolean AND/OR/NOT fulltext (_fulltext_query, filter_engine.py:119-166)."""
    d = _t(spark, sf_dir, "documents")
    up = F.upper(F.col("text"))
    return d.filter(
        (up.contains("THE") | up.contains("AND")) & ~up.contains("ZZZZZ")
        & up.contains("A")
    ).select("doc_id", "n_chars")


def q_quality_missing(spark, sf_dir):
    """Field missing/present masks (_apply_quality, filter_engine.py:169-181)."""
    e = _t(spark, sf_dir, "events")
    empty = F.col("props").isNull() | (F.trim(F.col("props")) == "") | (
        F.upper(F.col("props")) == "NAN"
    )
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.when(empty, 1).otherwise(0)).alias("n_missing_props"),
    )


# -- facets / quality aggregations ------------------------------------------

def q_facets_topn(spark, sf_dir):
    """value_counts top-N facet (compute_facets, filter_engine.py:219-247)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("event_type"))
        .limit(5)
    )


def q_crosstab(spark, sf_dir):
    """Year x status crosstab (quality.py:241-256) with the per-year total
    column (subsumes the former q_year_histogram: n_orders = F + O + P)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").alias("yr"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0, ["F", "O", "P"])
        .withColumn("n_orders", F.col("F") + F.col("O") + F.col("P"))
    )


def q_bucket_histogram(spark, sf_dir):
    """Fixed-bucket histogram (quality.py:273-287)."""
    li = _t(spark, sf_dir, "lineitem")
    bucket = (
        F.when(F.col("l_quantity") <= 10, "0-10")
        .when(F.col("l_quantity") <= 25, "11-25")
        .when(F.col("l_quantity") <= 40, "26-40")
        .otherwise("41+")
    )
    return li.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("n"))


def q_fill_health(spark, sf_dir):
    """Per-field filled counts (_compute_stats, quality.py:59-106) plus the
    weighted data-health score (weights: text 3, lang 2, source 1) in one
    single-row aggregate — merges the former q_fill_rate + q_health_score.
    The filled_* counts use the plain non-empty rule; the health score
    additionally excludes 'NAN' placeholders (reference semantics)."""
    d = _t(spark, sf_dir, "documents")

    def filled(c):
        return F.sum(
            F.when(
                F.col(c).isNotNull() & (F.trim(F.col(c).cast("string")) != ""), 1
            ).otherwise(0)
        )

    def sane(c):
        s = F.col(c).cast("string")
        return F.sum(
            (s.isNotNull() & (F.trim(s) != "") & (F.upper(F.trim(s)) != "NAN")).cast("int")
        )

    agg = d.agg(
        F.count("*").alias("total"),
        filled("text").alias("filled_text"),
        filled("lang").alias("filled_lang"),
        filled("source").alias("filled_source"),
        sane("text").alias("_f_text"),
        sane("lang").alias("_f_lang"),
        sane("source").alias("_f_source"),
    )
    # try_divide: an EMPTY documents table yields total=0 in the one agg
    # row, and under ANSI mode (Spark 4 default) 0/0 is a job failure —
    # health on an empty table is NULL, not a crash
    score = (
        3 * F.try_divide(F.col("_f_text"), F.col("total"))
        + 2 * F.try_divide(F.col("_f_lang"), F.col("total"))
        + 1 * F.try_divide(F.col("_f_source"), F.col("total"))
    ) / F.lit(6.0)
    return agg.select(
        "total", "filled_text", "filled_lang", "filled_source",
        F.round(score, 6).alias("health_score"),
    )


def q_sum_decimal(spark, sf_dir):
    """Exact decimal revenue aggregation per flag/status (order-insensitive
    by decimal arithmetic — float sums are order-dependent, so the engine
    aggregates money in DECIMAL)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 2
        ).alias("sum_price"),
        F.round(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"), 2
        ).alias("sum_qty"),
        F.count("*").alias("n"),
    )


# -- merge-style aggregations (MergeDB.py) -----------------------------------

def q_merge_aggs(spark, sf_dir):
    """Merge-style aggregations in one grouped pass (former
    q_first_non_null_merge + q_union_dedup_agg): deterministic first-value
    merge (min_by replaces pandas first-non-null, merge_values,
    MergeDB.py:14-25) and the sorted set-union string agg (DB_Original
    merge, MergeDB.py:788-811)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.min_by("event_type", "event_id").alias("first_event_type"),
        F.count("*").alias("n_events"),
        F.array_join(
            F.array_sort(F.array_distinct(F.collect_list("event_type"))), "; "
        ).alias("event_types"),
    )


# -- joins --------------------------------------------------------------------

def q_blocking_join(spark, sf_dir):
    """Candidate-pair counts per block (build_blocks + common-key join,
    smart_merger.py:185-198,624-655); the small dim sides are broadcast.
    The appended 'lost_customers' row is the left-anti unmatched-rows count
    (lost records, smart_merger.py:738-744 — former q_left_anti_lost).

    r6: the per-block pair count is computed as the exact algebraic
    factorization count(c x_k s) = count_k(c) * count_k(s) — aggregate
    pushdown through the equi-join.  The materialized join produced
    |block_c| x |block_s| rows per nation (60M rows at the 6M-lineitem
    scale) only to count them; aggregating each side first joins 25-row
    frames instead.  Identical result by construction, including nations
    with an empty side (inner join drops them, exactly as the pair join
    produced no rows)."""
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    c_blocks = c.groupBy("c_nationkey").agg(F.count("*").alias("_nc"))
    s_blocks = s.groupBy("s_nationkey").agg(F.count("*").alias("_ns"))
    per_block = (
        c_blocks.join(
            F.broadcast(s_blocks), c_blocks.c_nationkey == s_blocks.s_nationkey
        )
        .join(F.broadcast(n), c_blocks.c_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("label"),
            (F.col("_nc") * F.col("_ns")).alias("n"),
        )
    )
    lost = (
        # distinct-first (r6): the anti join only needs the existence of a
        # custkey on the right; map-side partial dedup shrinks the 10+
        # orders-per-customer table before the broadcast build
        c.join(
            o.select("o_custkey").distinct(),
            c.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
        .agg(F.count("*").alias("n"))
        .select(F.lit("lost_customers").alias("label"), "n")
    )
    return per_block.unionByName(lost)


def q_theta_window_join(spark, sf_dir):
    """|Δ| <= 1 theta predicate inside a blocked join (year-window predicate,
    smart_merger.py:288-296): adjacent-event pairs per user within 60s."""
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(b, F.col("a.user_id") == F.col("b.user_id"))
        .filter(
            (F.col("a.event_id") < F.col("b.event_id"))
            & (
                F.abs(
                    F.unix_micros(F.col("a.ts").cast("timestamp"))
                    - F.unix_micros(F.col("b.ts").cast("timestamp"))
                )
                <= 60_000_000
            )
        )
        .groupBy(F.col("a.user_id").alias("user_id"))
        .agg(F.count("*").alias("n_adjacent_pairs"))
    )


# -- sorts / limits / windows --------------------------------------------------

def q_topk_per_group(spark, sf_dir):
    """Greedy best-match analogue: row_number over confidence-desc
    (smart_merger.py:654-660 -> SURVEY.md §2.5)."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def q_pagination(spark, sf_dir):
    """Stable-order pagination (paginate, filter_engine.py:259-300)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy("o_orderkey").offset(100).limit(50).select("o_orderkey", "o_totalprice")
    )


# -- set operations ------------------------------------------------------------

def q_set_ops(spark, sf_dir):
    """union/intersect/except counts in one result row (SURVEY.md §2.7)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k")).distinct()
    return (
        c.intersect(o).agg(F.count("*").alias("n_intersect"))
        .crossJoin(c.exceptAll(o).agg(F.count("*").alias("n_except")))
        .crossJoin(c.union(o).distinct().agg(F.count("*").alias("n_union")))
    )


QUERIES = {
    "q_fill_health": q_fill_health,
    "q_range_filter": q_range_filter,
    "q_set_membership": q_set_membership,
    "q_contains_any": q_contains_any,
    "q_fulltext_bool": q_fulltext_bool,
    "q_quality_missing": q_quality_missing,
    "q_facets_topn": q_facets_topn,
    "q_crosstab": q_crosstab,
    "q_bucket_histogram": q_bucket_histogram,
    "q_sum_decimal": q_sum_decimal,
    "q_merge_aggs": q_merge_aggs,
    "q_blocking_join": q_blocking_join,
    "q_theta_window_join": q_theta_window_join,
    "q_topk_per_group": q_topk_per_group,
    "q_pagination": q_pagination,
    "q_set_ops": q_set_ops,
}

ORACLES = {
    "q_fill_health": """
      WITH agg AS (
        SELECT CAST(count(*) AS BIGINT) AS total,
               CAST(sum(CASE WHEN text IS NOT NULL AND trim(CAST(text AS VARCHAR)) <> ''
                        THEN 1 ELSE 0 END) AS BIGINT) AS filled_text,
               CAST(sum(CASE WHEN lang IS NOT NULL AND trim(CAST(lang AS VARCHAR)) <> ''
                        THEN 1 ELSE 0 END) AS BIGINT) AS filled_lang,
               CAST(sum(CASE WHEN source IS NOT NULL AND trim(CAST(source AS VARCHAR)) <> ''
                        THEN 1 ELSE 0 END) AS BIGINT) AS filled_source,
               CAST(sum(CASE WHEN text IS NOT NULL AND trim(CAST(text AS VARCHAR)) <> ''
                        AND upper(trim(CAST(text AS VARCHAR))) <> 'NAN' THEN 1 ELSE 0 END) AS BIGINT) AS f_text,
               CAST(sum(CASE WHEN lang IS NOT NULL AND trim(CAST(lang AS VARCHAR)) <> ''
                        AND upper(trim(CAST(lang AS VARCHAR))) <> 'NAN' THEN 1 ELSE 0 END) AS BIGINT) AS f_lang,
               CAST(sum(CASE WHEN source IS NOT NULL AND trim(CAST(source AS VARCHAR)) <> ''
                        AND upper(trim(CAST(source AS VARCHAR))) <> 'NAN' THEN 1 ELSE 0 END) AS BIGINT) AS f_source
        FROM documents
      )
      SELECT total, filled_text, filled_lang, filled_source,
             ROUND((3.0 * f_text / total + 2.0 * f_lang / total
                    + 1.0 * f_source / total) / 6.0, 6) AS health_score
      FROM agg
    """,
    "q_range_filter": """
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      FROM orders
      WHERE o_totalprice BETWEEN 100000 AND 150000
        AND o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
    """,
    "q_set_membership": """
      SELECT o_orderkey, o_orderpriority FROM orders
      WHERE upper(trim(o_orderpriority)) IN ('1-URGENT', '2-HIGH')
    """,
    "q_contains_any": """
      SELECT doc_id, lang, source FROM documents
      WHERE lower(text) LIKE '%data%' OR lower(text) LIKE '%model%'
    """,
    "q_fulltext_bool": """
      SELECT doc_id, n_chars FROM documents
      WHERE (upper(text) LIKE '%THE%' OR upper(text) LIKE '%AND%')
        AND upper(text) NOT LIKE '%ZZZZZ%'
        AND upper(text) LIKE '%A%'
    """,
    "q_quality_missing": """
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN props IS NULL OR trim(props) = ''
                           OR upper(props) = 'NAN' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_missing_props
      FROM events GROUP BY event_type
    """,
    "q_facets_topn": """
      SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY event_type
      ORDER BY cnt DESC, event_type ASC LIMIT 5
    """,
    "q_crosstab": """
      SELECT yr, "F", "O", "P", "F" + "O" + "P" AS n_orders FROM (
        SELECT CAST(year(o_orderdate) AS INT) AS yr,
               CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS "F",
               CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS "O",
               CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS "P"
        FROM orders GROUP BY 1
      )
    """,
    "q_bucket_histogram": """
      SELECT CASE WHEN l_quantity <= 10 THEN '0-10'
                  WHEN l_quantity <= 25 THEN '11-25'
                  WHEN l_quantity <= 40 THEN '26-40'
                  ELSE '41+' END AS bucket,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1
    """,
    "q_sum_decimal": """
      SELECT l_returnflag, l_linestatus,
             ROUND(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price,
             ROUND(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "q_merge_aggs": """
      SELECT user_id, min_by(event_type, event_id) AS first_event_type,
             CAST(count(*) AS BIGINT) AS n_events,
             array_to_string(list_sort(list_distinct(list(event_type))), '; ')
               AS event_types
      FROM events GROUP BY user_id
    """,
    "q_blocking_join": """
      SELECT n_name AS label, CAST(count(*) AS BIGINT) AS n
      FROM customer c
      JOIN supplier s ON c.c_nationkey = s.s_nationkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n_name
      UNION ALL
      SELECT 'lost_customers' AS label, CAST(count(*) AS BIGINT) AS n
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "q_theta_window_join": """
      SELECT a.user_id AS user_id, CAST(count(*) AS BIGINT) AS n_adjacent_pairs
      FROM events a JOIN events b ON a.user_id = b.user_id
      WHERE a.event_id < b.event_id
        AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 60000000
      GROUP BY a.user_id
    """,
    "q_topk_per_group": """
      SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders
      ) WHERE rn <= 3
    """,
    "q_pagination": """
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_orderkey LIMIT 50 OFFSET 100
    """,
    "q_set_ops": """
      WITH c AS (SELECT c_custkey AS k FROM customer),
           o AS (SELECT DISTINCT o_custkey AS k FROM orders)
      SELECT
        (SELECT CAST(count(*) AS BIGINT) FROM (SELECT k FROM c INTERSECT SELECT k FROM o)) AS n_intersect,
        (SELECT CAST(count(*) AS BIGINT) FROM (SELECT k FROM c EXCEPT ALL SELECT k FROM o)) AS n_except,
        (SELECT CAST(count(*) AS BIGINT) FROM (SELECT DISTINCT k FROM (SELECT k FROM c UNION ALL SELECT k FROM o))) AS n_union
    """,
}
