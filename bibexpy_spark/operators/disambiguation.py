"""Entity disambiguation: author-mention blocking, per-block clustering,
tier classification, ORCID arbitration — Spark-first.

Reference parity (apps/api/services/disambiguation/):
  mention extraction      blocking.py:198-227 (authors split from AU, ORCID
                          and affiliation signals from C1/OI)
  block key               blocking.py:193-197 (surname + first initial)
  greedy transitive       blocking.py:116-140 (_greedy_cluster, JW>=thr to
  clustering              ANY member joins) -> single-link = connected
                          components; computed per block inside an
                          applyInPandas grouped-map (blocks are small by
                          construction; the all-pairs JW stays in-block)
  tiers                   blocking.py:244-253: Tier 1 auto-merge if min
                          pairwise JW >= 0.95, else Tier 2 review
                          (Fellegi-Sunter bands, noted blocking.py:69-73)
  ORCID arbitration       orcid.py:245-261 classify_by_orcid: all variants
                          share an ORCID -> merge; disjoint ORCID sets ->
                          conflict; else unknown

The grouped-map does per-block O(n_block²) similarity — exactly the
reference's complexity, but blocks run in parallel across executors and the
block key bounds n_block.  Oversized blocks (hot surnames) are salted into
sub-blocks by a hash of the full normalized name, trading cross-sub-block
recall for bounded work — recorded in the output (``salted`` flag), never
silent.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bibexpy_spark.functions import bibex_norms as bn
from bibexpy_spark.functions.bibex_norms import jaro_winkler

TIER1_MIN_JW = 0.95
CLUSTER_JW = 0.88
MAX_BLOCK = 5000


def extract_mentions(records: DataFrame, id_col: str = "UID") -> DataFrame:
    """records(AU [, OI]) -> one row per author mention.

    Output: record_id, author_pos, raw_name, norm_name, surname, initials,
    orcid (if an OI column of 'Name/0000-...; ...' pairs exists).
    """
    base = records.select(
        F.col(id_col).alias("record_id"),
        F.posexplode(bn.split_multivalue(F.col("AU"))).alias("author_pos", "raw_name"),
    )
    base = base.withColumn("clean_name", bn.strip_split_suffix(F.col("raw_name")))
    base = base.withColumn("norm_name", bn.normalize_name_udf(F.col("clean_name")))
    base = base.withColumn("parts", bn.name_initials_udf(F.col("clean_name")))
    base = base.select(
        "record_id", "author_pos", "raw_name", "norm_name",
        F.col("parts.surname").alias("surname"),
        F.col("parts.initials").alias("initials"),
    )
    if "OI" in records.columns:
        oi = records.select(
            F.col(id_col).alias("record_id"),
            F.explode(bn.split_multivalue(F.col("OI"))).alias("oi_entry"),
        ).select(
            "record_id",
            bn.normalize_name_udf(F.regexp_extract("oi_entry", r"^(.*)/", 1)).alias("norm_name"),
            F.regexp_extract("oi_entry", r"(\d{4}-\d{4}-\d{4}-[\dX]{4})", 1).alias("orcid"),
        ).filter(F.col("orcid") != "")
        base = base.join(oi, ["record_id", "norm_name"], "left")
    else:
        base = base.withColumn("orcid", F.lit(None).cast("string"))
    return base


def block_key():
    """surname + first initial (blocking.py:193-197)."""
    return F.concat_ws(
        "|", F.col("surname"), F.coalesce(F.substring("initials", 1, 1), F.lit(""))
    )


_CLUSTER_SCHEMA = T.StructType(
    [
        T.StructField("record_id", T.StringType()),
        T.StructField("author_pos", T.IntegerType()),
        T.StructField("raw_name", T.StringType()),
        T.StructField("norm_name", T.StringType()),
        T.StructField("orcid", T.StringType()),
        T.StructField("block", T.StringType()),
        T.StructField("cluster_id", T.StringType()),
        T.StructField("tier", T.IntegerType()),
        T.StructField("salted", T.BooleanType()),
    ]
)


def cluster_blocks(mentions: DataFrame, jw_threshold: float = CLUSTER_JW) -> DataFrame:
    """Per-block single-link clustering over distinct name variants.

    Grouped-map pandas UDF: union-find over variant pairs with
    JW >= threshold (exactly _greedy_cluster's transitive semantics,
    blocking.py:116-140, made order-independent).  Tier 1 iff every
    intra-cluster pairwise JW >= 0.95 (blocking.py:244-253).
    """
    keyed = mentions.withColumn("block", block_key()).withColumn(
        "salted",
        F.lit(False),
    )

    # applyInPandas dispatches on arity (2 params => (key, pdf)), so the
    # grouped-map entrypoint below stays single-arg and recursion happens
    # through this helper.
    def _cluster_rec(pdf: pd.DataFrame, depth: int) -> pd.DataFrame:
        block = pdf["block"].iloc[0]
        salted = False
        # guard on DISTINCT variants, not mention rows: the pairwise loop
        # below is O(variants²) — a block of 100k mentions of ONE name is
        # cheap and must not salt (r4 review: salting such a block by
        # norm_name hash reproduced the identical block and recursed
        # forever).  depth-capped for provable termination: the salt folds
        # the depth in, so every level re-buckets with an INDEPENDENT hash
        # (a depth-blind salt would regroup an oversized bucket into the
        # identical bucket and the recursion would be a no-op); at the cap
        # the quadratic loop is finite anyway.
        if pdf["norm_name"].nunique(dropna=True) > MAX_BLOCK and depth < 3:
            # hot-block salting: sub-block by depth-folded norm_name hash
            pdf = pdf.assign(
                block=pdf["block"] + "#" + pdf["norm_name"].map(
                    lambda s: str(hash_bucket(f"{depth}|{s}"))
                )
            )
            salted = True
            return pd.concat(
                [_cluster_rec(g, depth + 1) for _, g in pdf.groupby("block", sort=True)]
            ).assign(salted=True)

        variants = sorted(set(pdf["norm_name"].dropna()))
        parent = {v: v for v in variants}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        sims: dict[tuple[str, str], float] = {}
        for i in range(len(variants)):
            for j in range(i + 1, len(variants)):
                jw = jaro_winkler(variants[i], variants[j])
                sims[(variants[i], variants[j])] = jw
                if jw >= jw_threshold:
                    ra, rb = find(variants[i]), find(variants[j])
                    if ra != rb:
                        lo, hi = sorted((ra, rb))
                        parent[hi] = lo
        clusters: dict[str, list[str]] = {}
        for v in variants:
            clusters.setdefault(find(v), []).append(v)
        tier_of = {}
        for root, members in clusters.items():
            t1 = all(
                sims.get(tuple(sorted((a, b))), 1.0) >= TIER1_MIN_JW
                for i, a in enumerate(members)
                for b in members[i + 1:]
            )
            tier_of[root] = 1 if t1 else 2
        out = pdf.copy()
        out["cluster_id"] = [
            (block + "::" + find(v)) if isinstance(v, str) and v in parent else None
            for v in out["norm_name"]
        ]
        out["tier"] = [
            tier_of.get(find(v)) if isinstance(v, str) and v in parent else None
            for v in out["norm_name"]
        ]
        out["salted"] = salted
        return out[[f.name for f in _CLUSTER_SCHEMA.fields]]

    def _cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        return _cluster_rec(pdf, 0)

    return keyed.select(
        "record_id", "author_pos", "raw_name", "norm_name", "orcid", "block", "salted"
    ).groupBy("block").applyInPandas(_cluster, schema=_CLUSTER_SCHEMA)


def hash_bucket(s: str, buckets: int = 64) -> int:
    import hashlib

    return int.from_bytes(hashlib.blake2b(str(s).encode(), digest_size=2).digest(), "big") % buckets


def orcid_arbitrate(clustered: DataFrame) -> DataFrame:
    """Cluster-level ORCID verdict (orcid.py:245-261): per cluster, collect
    ORCID sets per variant; all-pairwise-overlapping -> merge, any two
    disjoint non-empty sets -> conflict, else unknown.  Set algebra via
    native array functions over a two-level aggregation."""
    per_variant = (
        clustered.filter(F.col("orcid").isNotNull() & (F.col("orcid") != ""))
        .groupBy("cluster_id", "norm_name")
        .agg(F.array_sort(F.collect_set("orcid")).alias("orcids"))
    )
    # exact reference semantics (classify_by_orcid, orcid.py:245-261):
    # conflict iff ANY TWO known sets are disjoint; merge iff every pair of
    # known sets intersects (pairwise — NOT a single common element: three
    # sets with pairwise overlap but empty triple intersection still merge).
    # Pairwise check as a distributed self-join on cluster_id — clusters are
    # tiny (a handful of name variants), so the pair volume is bounded.
    a = per_variant.select(
        "cluster_id", F.col("norm_name").alias("_na"), F.col("orcids").alias("_oa")
    )
    b = per_variant.select(
        "cluster_id", F.col("norm_name").alias("_nb"), F.col("orcids").alias("_ob")
    )
    pair_verdict = (
        a.join(b, "cluster_id")
        .filter(F.col("_na") < F.col("_nb"))
        .groupBy("cluster_id")
        .agg(
            F.max(
                (F.size(F.array_intersect("_oa", "_ob")) == 0).cast("int")
            ).alias("_any_disjoint")
        )
    )
    per_cluster = (
        per_variant.groupBy("cluster_id")
        .agg(F.count("*").alias("n_variants_with_orcid"))
        .join(pair_verdict, "cluster_id", "left")
    )
    verdict = (
        F.when(F.col("n_variants_with_orcid") < 2, F.lit("unknown"))
        .when(F.col("_any_disjoint") == 1, F.lit("conflict"))
        .otherwise(F.lit("merge"))
    )
    return per_cluster.select(
        "cluster_id",
        "n_variants_with_orcid",
        verdict.alias("orcid_verdict"),
    )


def canonical_variant_mapping(clustered: DataFrame) -> dict[str, str]:
    """variant raw_name -> canonical raw_name per cluster.

    Canonical = the most frequent raw variant (ties: lexicographically
    first) — the reference picks the dominant variant when applying
    clusters (pipeline.py:721-881).  Returns a plain dict for broadcast
    into the rewrite UDF; cluster counts are aggregated distributed and
    only the (variant, canonical) pairs reach the driver.
    """
    from pyspark.sql import Window as W

    counts = clustered.groupBy("cluster_id", "raw_name").agg(
        F.count("*").alias("n")
    )
    best = (
        counts.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("cluster_id").orderBy(F.desc("n"), F.asc("raw_name"))
            ),
        )
        .filter(F.col("rk") == 1)
        .select("cluster_id", F.col("raw_name").alias("canonical"))
    )
    pairs = (
        clustered.select("cluster_id", "raw_name")
        .distinct()
        .join(best, "cluster_id")
        .filter(F.col("raw_name") != F.col("canonical"))
        .collect()
    )
    return {r["raw_name"]: r["canonical"] for r in pairs}


def apply_cluster_variants(records: DataFrame, mapping: dict[str, str],
                           au_col: str = "AU") -> DataFrame:
    """Rewrite AU cells replacing each variant with its canonical form,
    preserving the '; ' structure (apply path, reference pipeline.py:721-881
    + c1_utils replace family).  The mapping ships in the UDF closure
    (task-broadcast)."""
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql import types as T

    def rewrite(cell: str) -> str:
        parts = [p.strip() for p in str(cell or "").split(";") if p.strip()]
        return "; ".join(mapping.get(p, p) for p in parts)

    @pandas_udf(T.StringType())
    def rewrite_udf(cells: pd.Series) -> pd.Series:
        return cells.fillna("").map(rewrite)

    return records.withColumn(au_col, rewrite_udf(F.col(au_col)))


def run_author_disambiguation(
    records: DataFrame,
    id_col: str = "UID",
    arbiter=None,
    arbiter_cache: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Full pass: mentions -> blocks -> clusters+tiers -> ORCID verdicts
    (pipeline.py:274-498 restated).

    With ``arbiter`` set (a callable payload-json -> verdict dict), Tier-2
    ORCID-unknown proposals additionally route through the content-hash-
    cached LLM arbitration tier (reference pipeline.py:396-410;
    operators/llm_arbitration.py) — the returned dict then carries
    ``arbitration_cache`` (the grown cache table to persist for the next
    run) and the proposals gain (payload, cache_key, llm_verdict,
    llm_source) columns.  Without an arbiter the pipeline shape is the
    reference's no-LLM branch: unknowns stay queued for manual review."""
    mentions = extract_mentions(records, id_col)
    clustered = cluster_blocks(mentions)
    verdicts = orcid_arbitrate(clustered)
    proposals = (
        clustered.groupBy("cluster_id", "tier")
        .agg(
            F.array_sort(F.collect_set("raw_name")).alias("variants"),
            F.count("*").alias("n_mentions"),
        )
        .filter(F.size("variants") > 1)
        .join(verdicts, "cluster_id", "left")
        .withColumn(
            "orcid_verdict", F.coalesce("orcid_verdict", F.lit("unknown"))
        )
    )
    out = {"mentions": mentions, "clusters": clustered, "proposals": proposals}
    if arbiter is not None:
        from bibexpy_spark.operators import llm_arbitration as llm

        res = llm.arbitrate_tier2_unknown(proposals, arbiter, cache=arbiter_cache)
        out["proposals"] = res["arbitrated"]
        out["arbitration_cache"] = res["cache"]
    return out
