"""Filter-spec compiler: JSON-ish filter spec -> Catalyst Column tree.

Reference parity: the filter/query engine
(apps/api/services/filter_engine.py) — range filters (:86-96), set
membership (:99-104), contains-any over multi-value cells (:107-116),
boolean fulltext with quoted phrases (:119-166), data-quality masks
(:169-181), conjunctive composition (:184-211), facets (:219-247), and
pagination (:259-300).

Everything compiles to native Column expressions, so Catalyst pushes the
predicates into the scan (visible as PushedFilters in .explain) — the
reference's in-memory pandas masks become free pushdown at 100 TB.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W


def _empty(col: F.Column) -> F.Column:
    s = col.cast("string")
    return s.isNull() | (F.trim(s) == "") | (F.upper(F.trim(s)) == "NAN")


def compile_range(col: str, lo=None, hi=None) -> F.Column:
    c = F.col(col).try_cast("double")  # malformed -> NULL (filtered), not error
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (c >= lo)
    if hi is not None:
        cond = cond & (c <= hi)
    return cond


def compile_in(col: str, values: list[str]) -> F.Column:
    vals = [str(v).strip().upper() for v in values]
    return F.upper(F.trim(F.col(col).cast("string"))).isin(*vals)


def compile_contains_any(col: str, needles: list[str]) -> F.Column:
    c = F.upper(F.col(col).cast("string"))
    cond = F.lit(False)
    for n in needles:
        cond = cond | c.contains(str(n).upper())
    return cond


_TOKEN_RE = re.compile(r'"([^"]*)"|(\bAND\b|\bOR\b|\bNOT\b|\(|\))|([^\s()]+)', re.I)


def compile_fulltext(cols: list[str], query: str) -> F.Column:
    """Boolean AND/OR/NOT + quoted phrases over concatenated fields
    (parity _fulltext_query, filter_engine.py:119-166).  Uppercase both
    sides; implicit AND between adjacent terms."""
    hay = F.upper(
        F.concat_ws(" ", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols])
    )

    tokens: list[str] = []
    for m in _TOKEN_RE.finditer(query):
        phrase, op, word = m.groups()
        if phrase is not None:
            tokens.append(("TERM", phrase))
        elif op is not None:
            tokens.append((op.upper(), op.upper()))
        else:
            tokens.append(("TERM", word))

    # shunting-yard-lite recursive descent: OR < AND < NOT < atom
    pos = 0

    def peek():
        return tokens[pos] if pos < len(tokens) else (None, None)

    def parse_or():
        nonlocal pos
        left = parse_and()
        while peek()[0] == "OR":
            pos += 1
            left = left | parse_and()
        return left

    def parse_and():
        nonlocal pos
        left = parse_not()
        while peek()[0] in ("AND", "TERM", "NOT", "("):
            if peek()[0] == "AND":
                pos += 1
            left = left & parse_not()
        return left

    def parse_not():
        nonlocal pos
        if peek()[0] == "NOT":
            pos += 1
            return ~parse_not()
        return parse_atom()

    def parse_atom():
        nonlocal pos
        kind, val = peek()
        if kind == "(":
            pos += 1
            inner = parse_or()
            if peek()[0] == ")":
                pos += 1
            return inner
        pos += 1
        return hay.contains(str(val).upper())

    if not tokens:
        return F.lit(True)
    return parse_or()


def compile_quality(col: str, mode: str) -> F.Column:
    """mode: 'missing' or 'present' (parity _apply_quality)."""
    return _empty(F.col(col)) if mode == "missing" else ~_empty(F.col(col))


def apply_filter(df: DataFrame, spec: dict[str, Any],
                 fulltext_cols: list[str] | None = None) -> DataFrame:
    """Conjunctive composition over spec keys (parity apply_filter,
    filter_engine.py:184-211).

    spec = {
      "ranges":   {col: [lo, hi], ...},
      "in":       {col: [v, ...], ...},
      "contains": {col: [needle, ...], ...},
      "fulltext": "boolean query",
      "quality":  {col: "missing"|"present", ...},
    }
    """
    cond = F.lit(True)
    for col, (lo, hi) in (spec.get("ranges") or {}).items():
        cond = cond & compile_range(col, lo, hi)
    for col, vals in (spec.get("in") or {}).items():
        cond = cond & compile_in(col, vals)
    for col, needles in (spec.get("contains") or {}).items():
        cond = cond & compile_contains_any(col, needles)
    if spec.get("fulltext"):
        cond = cond & compile_fulltext(fulltext_cols or df.columns, spec["fulltext"])
    for col, mode in (spec.get("quality") or {}).items():
        cond = cond & compile_quality(col, mode)
    return df.filter(cond)


def compute_facets(df: DataFrame, facet_cols: list[str], top_n: int = 10) -> dict:
    """Top-N value counts per facet column (parity compute_facets,
    filter_engine.py:219-247). One job per facet; results are tiny."""
    out = {}
    for col in facet_cols:
        out[col] = (
            df.groupBy(F.col(col).cast("string").alias("value"))
            .count()
            .orderBy(F.desc("count"), F.asc("value"))
            .limit(top_n)
            .collect()
        )
    return out


# Types Spark defines no SortOrder for (INVALID_ORDERING_TYPE): maps,
# variant, and the raw calendar interval — nor anything containing one.
# getattr-gated: VariantType arrived in Spark 4.0.
_NON_ORDERABLE = tuple(
    t for t in (
        T.MapType,
        getattr(T, "VariantType", None),
        getattr(T, "CalendarIntervalType", None),
    ) if t is not None
)


def _orderable(dt: T.DataType) -> bool:
    """Whether Spark can sort on a column of this type."""
    if isinstance(dt, _NON_ORDERABLE):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def paginate(df: DataFrame, order_col: str, offset: int, limit: int,
             cols: list[str] | None = None) -> DataFrame:
    """Stable-order pagination (parity paginate, filter_engine.py:259-300).

    Ties on ``order_col`` are broken by the other ORDERABLE output columns,
    so page boundaries are deterministic across the separate per-page jobs
    up to rows identical on every orderable column — a bare single-column
    sort would let a tied row land on two pages or neither (r4 review);
    non-orderable (map/variant/interval-typed) columns are skipped rather
    than raising AnalysisException."""
    base = df.select(*cols) if cols else df
    tiebreak = [
        f.name for f in base.schema.fields
        if f.name != order_col and _orderable(f.dataType)
    ]
    return base.orderBy(order_col, *tiebreak).offset(offset).limit(limit)
