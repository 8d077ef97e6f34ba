"""Data-quality metrics: fill rates, weighted health score, facet stats.

Reference parity (apps/api/routers/quality.py and
packages/bibex_core/modules/stats_utils.py):
  per-field fill counts + weighted health score   quality.py:59-106
    (field weights 3/2/1: core bibliographic fields weigh 3, enrichment
     fields 2, auxiliary 1 — quality.py:59-63)
  year x doc-type crosstab                        quality.py:241-256
  citation bucket histogram                       quality.py:273-287

One aggregation pass computes every fill rate (a single job, map-side
combinable); the weighted score is a constant-folded expression over the
aggregate row, not a driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: field -> weight (3 = core, 2 = important, 1 = auxiliary)
DEFAULT_WEIGHTS = {
    "TI": 3, "AU": 3, "PY": 3, "SO": 3,
    "DI": 2, "AB": 2, "DE": 2, "C1": 2,
    "ID": 1, "CR": 1, "TC": 1, "SN": 1,
}


def _filled(col: F.Column) -> F.Column:
    s = col.cast("string")
    return (
        s.isNotNull() & (F.trim(s) != "") & (F.upper(F.trim(s)) != "NAN")
    ).cast("int")


def fill_rates(df: DataFrame, fields: list[str] | None = None) -> DataFrame:
    """One row: total + filled_<field> for every requested present field."""
    fields = [f for f in (fields or list(DEFAULT_WEIGHTS)) if f in df.columns]
    aggs = [F.count("*").alias("total")] + [
        F.sum(_filled(F.col(f))).alias(f"filled_{f}") for f in fields
    ]
    return df.agg(*aggs)


def health_score(df: DataFrame, weights: dict[str, int] | None = None) -> DataFrame:
    """Weighted mean of per-field fill rates (quality.py:92-94): one row
    (total, health_score in [0,1])."""
    weights = weights or DEFAULT_WEIGHTS
    present = {f: w for f, w in weights.items() if f in df.columns}
    if not present:
        raise ValueError("no weighted fields present in the DataFrame")
    rates = fill_rates(df, list(present))
    total_w = sum(present.values())
    # try_divide: empty input -> total=0 in the one agg row; ANSI-mode 0/0
    # is a job failure, so an empty table scores NULL instead of crashing
    score = sum(
        F.try_divide(F.col(f"filled_{f}"), F.col("total")) * w
        for f, w in present.items()
    ) / F.lit(total_w)
    return rates.select(
        "total", F.round(score, 6).alias("health_score")
    )


def field_source_distribution(merged: DataFrame, fields: list[str]) -> DataFrame:
    """Counts of which side won each merged field — the reference's
    field_source_distribution summary (smart_merger.py:802-824) needs the
    merge to tag provenance; here computed post-hoc from a merged frame that
    kept w<f>/s<f> columns."""
    rows = []
    for f in fields:
        wcol, scol, mcol = f"w{f}", f"s{f}", f
        if all(c in merged.columns for c in (wcol, scol, mcol)):
            src = (
                F.when(F.col(mcol).isNull(), "empty")
                .when(F.col(mcol) == F.col(wcol).cast("string"), "wos")
                .when(F.col(mcol) == F.col(scol).cast("string"), "scopus")
                .otherwise("combined")
            )
            rows.append(
                merged.groupBy(src.alias("source"))
                .agg(F.count("*").alias("n"))
                .withColumn("field", F.lit(f))
            )
    if not rows:
        raise ValueError("no mergeable field triples present")
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.select("field", "source", "n")
