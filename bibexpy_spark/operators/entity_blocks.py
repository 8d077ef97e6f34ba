"""Blocked entity-standardization proposal builders: affiliation clustering,
author split detection + apply, country standardization, organization rollup.

Reference parity (apps/api/services/disambiguation/blocking.py +
pipeline.py):
  affiliation blocks     blocking.py:362-429 (first-meaningful-token block,
                         greedy JW clustering, Tier 1 iff min pairwise JW >=
                         0.95) — greedy transitive clustering is re-expressed
                         as order-independent single-link union-find (same
                         fixpoint, deterministic under partitioning)
  author splits          blocking.py:286-359 (same-name mentions partitioned
                         into field-disjoint components over WC/SC/DE/ID
                         tokens; >=2 components -> split proposal; largest
                         group keeps the plain name, others get '(b)'/'(c)')
  apply splits           pipeline.py:884-975 (whitespace-tolerant AU token
                         rewrite, suffix append)
  country blocks         blocking.py:429-513 (dict-canonical variants ->
                         Tier 1 auto; unknown non-org, non-numeric tokens ->
                         Tier 2 review)
  org rollup             blocking.py:513-583 (parse each address to its
                         parent institution; cluster variants per first-token
                         block; canonical = most frequent parent)

Spark shape: mention extraction is native explode/regexp work; per-block
clustering runs inside applyInPandas grouped-maps (blocks are small by
construction, the all-pairs JW stays in-block and blocks run in parallel
across executors — the same bounded-block pattern as operators/
disambiguation.py).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bibexpy_spark.functions import bibex_norms as bn
from bibexpy_spark.functions import c1_address as c1
from bibexpy_spark.functions.bibex_norms import jaro_winkler

AFFIL_SIM_THRESHOLD = 0.85
AUTO_THRESHOLD = 0.95
_BLOCK_STOP = {"the", "of", "and", "for", "univ", "university"}

#: field/category columns — the author-split signal (blocking.py:75-79)
FIELD_COLS = ("WC", "SC", "DE", "ID")


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

def _block_key_expr(norm_col):
    """First meaningful (non-stopword) token of the normalized name, else the
    first 5 chars (blocking.py:381-384)."""
    toks = F.filter(
        F.split(norm_col, " "),
        lambda t: (t != "") & ~t.isin(*sorted(_BLOCK_STOP)),
    )
    return F.when(F.size(toks) > 0, toks.getItem(0)).otherwise(
        F.substring(norm_col, 1, 5)
    )


def _union_find_clusters(norms: list[str], threshold: float) -> dict[str, str]:
    """Single-link components over JW >= threshold (order-independent
    replacement of the reference's greedy loop, blocking.py:116-140)."""
    variants = sorted(set(norms))
    parent = {v: v for v in variants}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(variants)):
        for j in range(i + 1, len(variants)):
            if jaro_winkler(variants[i], variants[j]) >= threshold:
                ra, rb = find(variants[i]), find(variants[j])
                if ra != rb:
                    lo, hi = sorted((ra, rb))
                    parent[hi] = lo
    return {v: find(v) for v in variants}


def _min_pairwise_jw(norms: set[str]) -> float:
    items = sorted(norms)
    lo = 1.0
    for i in range(len(items)):
        for j in range(i + 1, len(items)):
            lo = min(lo, jaro_winkler(items[i], items[j]))
    return lo


# ---------------------------------------------------------------------------
# affiliation disambiguation (blocking.py:362-429)
# ---------------------------------------------------------------------------

def affiliation_mentions(
    records: DataFrame, id_col: str = "UID", c1_col: str = "C1"
) -> DataFrame:
    """One row per (record, affiliation string): record_id, raw, norm, block.

    Mirrors _split_affs (blocking.py:59-65): split on ';', strip '[...]'
    author prefixes, drop empties.
    """
    stripped = F.regexp_replace(F.col(c1_col).cast("string"), r"\[.*?\]", "")
    exploded = records.select(
        F.col(id_col).alias("record_id"),
        F.explode(F.split(stripped, ";")).alias("raw"),
    ).withColumn("raw", F.trim("raw")).filter(F.col("raw") != "")
    out = exploded.withColumn("norm", bn.normalize_name_udf(F.col("raw"))).filter(
        F.col("norm") != ""
    )
    return out.withColumn("block", _block_key_expr(F.col("norm")))


_AFFIL_CLUSTER_SCHEMA = T.StructType(
    [
        T.StructField("block", T.StringType()),
        T.StructField("cluster_id", T.StringType()),
        T.StructField("tier", T.IntegerType()),
        T.StructField("min_jw", T.DoubleType()),
        T.StructField("variants", T.ArrayType(T.StringType())),
        T.StructField("records", T.ArrayType(T.StringType())),
    ]
)


def affiliation_blocks(
    records: DataFrame,
    id_col: str = "UID",
    c1_col: str = "C1",
    sim_threshold: float = AFFIL_SIM_THRESHOLD,
    auto_threshold: float = AUTO_THRESHOLD,
) -> DataFrame:
    """Affiliation-variant merge proposals: one row per multi-variant
    cluster with tier (1 auto / 2 review) and the raw variants + records.

    Exact tier rule (blocking.py:398-420): a cluster proposes iff it has
    >= 2 distinct norms; Tier 1 iff min pairwise JW >= auto_threshold
    (string similarity alone is the affiliation signal — no field context).
    """
    mentions = affiliation_mentions(records, id_col, c1_col)

    def _cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        block = pdf["block"].iloc[0]
        roots = _union_find_clusters(pdf["norm"].tolist(), sim_threshold)
        rows = []
        by_root: dict[str, pd.DataFrame] = {}
        pdf = pdf.assign(_root=pdf["norm"].map(roots))
        for ci, (root, grp) in enumerate(sorted(pdf.groupby("_root"))):
            norms = set(grp["norm"])
            if len(norms) < 2:
                continue  # single variant -> nothing to merge (Tier 3)
            mjw = _min_pairwise_jw(norms)
            rows.append(
                {
                    "block": block,
                    "cluster_id": f"{block}_{ci}",
                    "tier": 1 if mjw >= auto_threshold else 2,
                    "min_jw": mjw,
                    "variants": sorted(set(grp["raw"])),
                    "records": sorted(set(grp["record_id"])),
                }
            )
        return pd.DataFrame(rows, columns=[f.name for f in _AFFIL_CLUSTER_SCHEMA.fields])

    return (
        mentions.select("record_id", "raw", "norm", "block")
        .groupBy("block")
        .applyInPandas(_cluster, schema=_AFFIL_CLUSTER_SCHEMA)
    )


# ---------------------------------------------------------------------------
# author split detection (blocking.py:286-359) + apply (pipeline.py:884-975)
# ---------------------------------------------------------------------------

_SPLIT_SUFFIXES = ["", "(b)", "(c)", "(d)", "(e)", "(f)", "(g)"]

_SPLIT_SCHEMA = T.StructType(
    [
        T.StructField("split_id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("norm", T.StringType()),
        T.StructField("tier", T.IntegerType()),
        T.StructField("group_idx", T.IntegerType()),
        T.StructField("suffix", T.StringType()),
        T.StructField("records", T.ArrayType(T.StringType())),
        T.StructField("fields", T.ArrayType(T.StringType())),
    ]
)


def author_field_mentions(records: DataFrame, id_col: str = "UID") -> DataFrame:
    """(record, author) mentions with the record's field-token set from
    WC/SC/DE/ID (blocking.py:80-97).  Already-split names ('X (b)') are
    excluded — a re-scan must never re-split them (idempotence rule,
    blocking.py:308-311)."""
    field_cols = [c for c in FIELD_COLS if c in records.columns]
    fields = (
        F.array_distinct(
            F.filter(
                F.flatten(
                    F.array(
                        *[
                            F.transform(
                                F.split(F.coalesce(F.col(c).cast("string"), F.lit("")), ";"),
                                lambda t: F.lower(F.trim(t)),
                            )
                            for c in field_cols
                        ]
                    )
                ),
                lambda t: (t != "") & (t != "nan"),
            )
        )
        if field_cols
        else F.array().cast("array<string>")
    )
    base = records.select(
        F.col(id_col).alias("record_id"),
        fields.alias("fields"),
        F.explode(bn.split_multivalue(F.col("AU"))).alias("raw_name"),
    ).filter(~bn.has_split_suffix(F.col("raw_name")))
    return base.withColumn("norm", bn.normalize_name_udf(F.col("raw_name"))).filter(
        F.col("norm") != ""
    )


def author_split_proposals(records: DataFrame, id_col: str = "UID") -> DataFrame:
    """Field-disjoint split proposals: one output row per proposed GROUP.

    Exact reference semantics (build_author_splits, blocking.py:286-359):
    mentions of one normalized name partition into components connected by
    shared field tokens; >= 2 fully-disjoint components -> split.  Largest
    group keeps the plain name (suffix ''), the rest get '(b)', '(c)', ...
    Tier 2 when some records carry no field data.  Deterministic tie-break
    (divergence from the reference's insertion-order sort, documented):
    groups order by (-size, min record id).
    """
    mentions = author_field_mentions(records, id_col)

    def _split(pdf: pd.DataFrame) -> pd.DataFrame:
        norm = pdf["norm"].iloc[0]
        name = sorted(pdf["raw_name"])[0]
        recs = [
            {"record": r, "fields": set(fs) if fs is not None else set()}
            for r, fs in zip(pdf["record_id"], pdf["fields"])
        ]
        # dedup per record (multiple mentions of the same name in one record)
        seen: dict[str, set] = {}
        for r in recs:
            seen.setdefault(r["record"], set()).update(r["fields"])
        recs = [{"record": k, "fields": v} for k, v in sorted(seen.items())]
        if len(recs) < 2:
            return pd.DataFrame(columns=[f.name for f in _SPLIT_SCHEMA.fields])
        with_fields = [r for r in recs if r["fields"]]
        unknown = [r for r in recs if not r["fields"]]
        if len(with_fields) < 2:
            return pd.DataFrame(columns=[f.name for f in _SPLIT_SCHEMA.fields])
        # transitive field-component partition (blocking.py:267-283)
        comps: list[list[dict]] = []
        for r in with_fields:
            hit = [
                ci for ci, comp in enumerate(comps)
                if any(r["fields"] & x["fields"] for x in comp)
            ]
            if not hit:
                comps.append([r])
            else:
                first = hit[0]
                comps[first].append(r)
                for ci in sorted(hit[1:], reverse=True):
                    comps[first].extend(comps[ci])
                    del comps[ci]
        if len(comps) < 2:
            return pd.DataFrame(columns=[f.name for f in _SPLIT_SCHEMA.fields])
        comps.sort(key=lambda c: (-len(c), min(x["record"] for x in c)))
        rows = []
        tier = 2 if unknown else 1
        sid = norm.replace(" ", "_")
        for gi, comp in enumerate(comps):
            rows.append(
                {
                    "split_id": sid,
                    "name": name,
                    "norm": norm,
                    "tier": tier,
                    "group_idx": gi,
                    "suffix": _SPLIT_SUFFIXES[gi]
                    if gi < len(_SPLIT_SUFFIXES)
                    else f"({gi})",
                    "records": sorted(x["record"] for x in comp),
                    "fields": sorted({f for x in comp for f in x["fields"]})[:8],
                }
            )
        return pd.DataFrame(rows, columns=[f.name for f in _SPLIT_SCHEMA.fields])

    return (
        mentions.select("record_id", "raw_name", "norm", "fields")
        .groupBy("norm")
        .applyInPandas(_split, schema=_SPLIT_SCHEMA)
    )


def apply_author_splits(
    records: DataFrame,
    splits: DataFrame,
    id_col: str = "UID",
    au_col: str = "AU",
) -> DataFrame:
    """Rewrite AU cells per approved split groups (apply_splits,
    pipeline.py:884-975): in each affected record, every author token whose
    NORMALIZED form equals the split's norm gets the suffix appended to its
    ORIGINAL spelling (``token (b)``).  Plain groups (suffix '') untouched.

    Matching by norm (not the whitespace-normalized raw, which the reference
    uses) closes a silent-partial-apply hole: the proposal groups records by
    norm, so a record carrying a differently-punctuated spelling ('SMITH, J'
    vs 'SMITH J') is still rewritten; preserving the original spelling keeps
    the rewrite idempotent and lossless.

    Distributed shape: explode (record, norm, suffix) assignments from the
    proposals, join to records on id (the assignment side is tiny ->
    broadcast), rewrite in one Arrow batch pass.
    """
    assign = (
        splits.filter(F.col("suffix") != "")
        .select(
            "norm", "suffix", F.explode("records").alias("record_id")
        )
        .groupBy("record_id")
        .agg(
            F.collect_list(F.struct("norm", "suffix")).alias("_splits")
        )
    )
    joined = records.join(
        F.broadcast(assign),
        records[id_col] == assign["record_id"],
        "left",
    ).drop("record_id")

    def _norm(s: str) -> str:
        import unicodedata

        t = unicodedata.normalize("NFKD", str(s or "")).encode(
            "ascii", "ignore"
        ).decode("ascii").lower()
        t = re.sub(r"[^a-z0-9]+", " ", t)
        return re.sub(r"\s+", " ", t).strip()

    @F.pandas_udf(T.StringType())
    def rewrite(au: pd.Series, splits_col: pd.Series) -> pd.Series:
        out = []
        for cell, spl in zip(au, splits_col):
            if spl is None or len(spl) == 0 or cell is None:
                out.append(cell)
                continue
            bynorm = {s["norm"]: s["suffix"] for s in spl}
            parts = [p.strip() for p in str(cell).split(";")]
            new = []
            for p in parts:
                sfx = bynorm.get(_norm(p))
                new.append(f"{p} {sfx}" if sfx else p)
            out.append(";".join(new))
        return pd.Series(out)

    return joined.withColumn(au_col, rewrite(F.col(au_col), F.col("_splits"))).drop(
        "_splits"
    )


# ---------------------------------------------------------------------------
# country standardization (blocking.py:429-513)
# ---------------------------------------------------------------------------

def country_tokens(records: DataFrame, id_col: str, c1_col: str = "C1") -> DataFrame:
    """Raw last-comma-part tokens per address (extract_country_from_c1,
    c1_utils.py:259-266): record_id, token."""
    stripped = F.regexp_replace(F.col(c1_col).cast("string"), r"\[.*?\]", "")
    addr = records.select(
        F.col(id_col).alias("record_id"),
        F.explode(F.split(stripped, ";")).alias("addr"),
    ).withColumn("addr", F.trim("addr")).filter(F.col("addr") != "")
    parts = F.filter(
        F.transform(F.split(F.col("addr"), ","), lambda p: F.trim(p)),
        lambda p: p != "",
    )
    return addr.select(
        "record_id", F.element_at(parts, -1).alias("token")
    ).filter(F.col("token").isNotNull() & (F.col("token") != ""))


_CANON_UDF_SCHEMA = T.StringType()


@F.pandas_udf(_CANON_UDF_SCHEMA)
def canonical_country_udf(tokens: pd.Series) -> pd.Series:
    return tokens.map(c1.canonical_country)


def country_blocks(records: DataFrame, id_col: str, c1_col: str = "C1") -> DataFrame:
    """Country standardization proposals (build_country_blocks,
    blocking.py:429-513):

      Tier 1  dictionary-canonical variants that differ from the canonical
              form (deterministic, auto-apply)
      Tier 2  unknown tokens, excluding org-keyword parts and tokens with
              digits (institution / postal noise never reaches review)

    Output: tier, canonical (null for tier 2), variants, n_records.
    """
    toks = country_tokens(records, id_col, c1_col).withColumn(
        "canonical", canonical_country_udf(F.col("token"))
    )

    resolved = (
        toks.filter(F.col("canonical").isNotNull())
        .groupBy("canonical")
        .agg(
            F.array_sort(F.collect_set("token")).alias("variants"),
            F.countDistinct("record_id").alias("n_records"),
        )
        # all-variants-already-canonical -> no change proposed
        .filter(
            F.exists(
                "variants",
                lambda v: F.lower(F.trim(v)) != F.lower(F.col("canonical")),
            )
        )
        .select(
            F.lit(1).alias("tier"), "canonical", "variants", "n_records"
        )
    )

    @F.pandas_udf(T.BooleanType())
    def is_orgish(tokens: pd.Series) -> pd.Series:
        return tokens.map(
            lambda t: c1._is_org(str(t)) or any(ch.isdigit() for ch in str(t))
        )

    unresolved = (
        toks.filter(F.col("canonical").isNull())
        .filter(~is_orgish(F.col("token")))
        .groupBy(F.lower(F.trim("token")).alias("_k"))
        .agg(
            F.array_sort(F.collect_set("token")).alias("variants"),
            F.countDistinct("record_id").alias("n_records"),
        )
        .select(
            F.lit(2).alias("tier"),
            F.lit(None).cast("string").alias("canonical"),
            "variants",
            "n_records",
        )
    )
    return resolved.unionByName(unresolved)


@F.pandas_udf(T.StringType())
def standardize_countries_udf(cells: pd.Series) -> pd.Series:
    """Apply path: replace each address's country component with its
    dictionary-canonical form, preserving '[author]' prefixes
    (replace_country_in_c1 with the full canonical mapping)."""

    def rewrite(cell: str) -> str:
        out = []
        for addr in c1.split_c1(cell):
            m = c1._BRACKET_RE.match(addr)
            prefix, rest = ("", addr)
            if m:
                prefix = "[" + m.group("authors") + "] "
                rest = m.group("rest")
            segs = [s.strip() for s in rest.split(",")]
            if segs:
                canon = c1.canonical_country(segs[-1])
                if canon and segs[-1].strip().lower() != canon.lower():
                    segs[-1] = canon
            out.append(prefix + ", ".join(segs))
        return "; ".join(out)

    return cells.fillna("").map(rewrite)


# ---------------------------------------------------------------------------
# organization rollup (blocking.py:513-583)
# ---------------------------------------------------------------------------

_ORG_SCHEMA = T.StructType(
    [
        T.StructField("block", T.StringType()),
        T.StructField("cluster_id", T.StringType()),
        T.StructField("tier", T.IntegerType()),
        T.StructField("canonical_name", T.StringType()),
        T.StructField("variants", T.ArrayType(T.StringType())),
        T.StructField("records", T.ArrayType(T.StringType())),
    ]
)


def org_rollup_blocks(
    records: DataFrame,
    id_col: str = "UID",
    c1_col: str = "C1",
    sim_threshold: float = AFFIL_SIM_THRESHOLD,
    auto_threshold: float = AUTO_THRESHOLD,
) -> DataFrame:
    """Parent-institution rollup proposals (build_org_rollup,
    blocking.py:513-583): parse each address, skip unparseable (no wrong
    rollup ever written), block on the institution's first meaningful token,
    cluster variants, canonical = most frequent parent (ties: lexicographic).
    Tier 1 iff single-norm cluster or min pairwise JW >= auto_threshold."""
    addr = (
        c1.explode_addresses(
            records.select(F.col(id_col).alias("_rid"), c1_col), "_rid"
        )
        .filter(F.col("institution").isNotNull())
        .withColumn("norm", bn.normalize_name_udf(F.col("institution")))
        .filter(F.col("norm") != "")
        .withColumn("block", _block_key_expr(F.col("norm")))
    )

    def _cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        block = pdf["block"].iloc[0]
        roots = _union_find_clusters(pdf["norm"].tolist(), sim_threshold)
        pdf = pdf.assign(_root=pdf["norm"].map(roots))
        rows = []
        for ci, (root, grp) in enumerate(sorted(pdf.groupby("_root"))):
            counts = grp["institution"].value_counts()
            top = counts.max()
            parent = sorted(counts[counts == top].index)[0]
            variants = sorted(set(grp["raw"]))
            if len(variants) == 1 and variants[0].strip() == parent.strip():
                continue  # address already equals its parent institution
            norms = set(grp["norm"])
            tier = (
                1
                if len(norms) < 2 or _min_pairwise_jw(norms) >= auto_threshold
                else 2
            )
            rows.append(
                {
                    "block": block,
                    "cluster_id": f"org_{block}_{ci}",
                    "tier": tier,
                    "canonical_name": parent,
                    "variants": variants,
                    "records": sorted(set(grp["_rid"])),
                }
            )
        return pd.DataFrame(rows, columns=[f.name for f in _ORG_SCHEMA.fields])

    return (
        addr.select("_rid", "raw", "institution", "norm", "block")
        .groupBy("block")
        .applyInPandas(_cluster, schema=_ORG_SCHEMA)
    )


def apply_org_rollup(records: DataFrame, c1_col: str = "C1") -> DataFrame:
    """Apply path: every parseable address collapses to
    'Institution, Country' (rollup_c1_to_parent, c1_utils.py:268-283)."""
    return records.withColumn(c1_col, c1.rollup_c1_udf(F.col(c1_col)))
