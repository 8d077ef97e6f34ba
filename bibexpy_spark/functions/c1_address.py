"""C1 (author-address) parsing and standardization, Spark-first.

Reference parity (packages/bibex_core/modules/c1_utils.py):
  bracket-aware ';' split      :191-222 (split_c1_addresses — ';' inside
                               '[Author; Other]' prefixes must not split)
  address parse                :225-257 (parse_c1_address: [authors] prefix,
                               institution = first comma part, country =
                               last comma part canonicalized)
  country canonicalization     :90-99 + variant dict :16-58
  rewrite family               :314-418 (replace/append country etc.,
                               preserving '[author]' prefixes)

All implemented as Arrow-batched pandas UDFs over a broadcast variant map —
the per-address logic is regex/string work unsuited to native exprs, but the
map ships once per executor (broadcast), not per row.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

#: country variant -> canonical (representative public subset; extend freely)
COUNTRY_VARIANTS = {
    "USA": "UNITED STATES", "U.S.A.": "UNITED STATES",
    "UNITED STATES OF AMERICA": "UNITED STATES",
    "PEOPLES R CHINA": "CHINA", "P.R. CHINA": "CHINA", "PR CHINA": "CHINA",
    "UK": "UNITED KINGDOM", "ENGLAND": "UNITED KINGDOM",
    "SCOTLAND": "UNITED KINGDOM", "WALES": "UNITED KINGDOM",
    "NORTH IRELAND": "UNITED KINGDOM",
    "TURKIYE": "TURKEY", "TÜRKIYE": "TURKEY",
    "RUSSIA": "RUSSIAN FEDERATION",
    "SOUTH KOREA": "KOREA", "REPUBLIC OF KOREA": "KOREA", "KOREA REP": "KOREA",
}

_BRACKET_RE = re.compile(r"^\s*\[(?P<authors>[^\]]*)\]\s*(?P<rest>.*)$", re.S)


def canonical_country(raw: str) -> str:
    s = re.sub(r"\s+", " ", str(raw or "")).strip().strip(".").upper()
    if s in COUNTRY_VARIANTS:
        return COUNTRY_VARIANTS[s]
    # dotted abbreviations: 'U.S.A' -> 'USA'
    return COUNTRY_VARIANTS.get(s.replace(".", ""), s)


def split_c1(cell: str) -> list[str]:
    """Bracket-aware split of a C1 cell on ';' (c1_utils.py:191-222):
    semicolons inside '[...]' author prefixes do not split."""
    out, buf, depth = [], [], 0
    for ch in str(cell or ""):
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth = max(0, depth - 1)
        if ch == ";" and depth == 0:
            part = "".join(buf).strip()
            if part:
                out.append(part)
            buf = []
        else:
            buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        out.append(tail)
    return out


def parse_address(addr: str) -> dict:
    """One address -> (authors, institution, country) (c1_utils.py:225-257)."""
    m = _BRACKET_RE.match(str(addr or ""))
    authors, rest = ("", addr or "")
    if m:
        authors, rest = m.group("authors").strip(), m.group("rest").strip()
    parts = [p.strip() for p in str(rest).split(",") if p.strip()]
    institution = parts[0] if parts else ""
    country = canonical_country(parts[-1]) if parts else ""
    return {
        "authors": authors,
        "institution": institution,
        "country": country,
        "raw": str(addr or ""),
    }


_ADDR_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("authors", T.StringType()),
            T.StructField("institution", T.StringType()),
            T.StructField("country", T.StringType()),
            T.StructField("raw", T.StringType()),
        ]
    )
)


@pandas_udf(_ADDR_SCHEMA)
def parse_c1_udf(cells: pd.Series) -> pd.Series:
    """C1 cell -> array of parsed address structs."""
    return cells.map(lambda c: [parse_address(a) for a in split_c1(c)])


def with_addresses(df: DataFrame, c1_col: str = "C1") -> DataFrame:
    return df.withColumn("addresses", parse_c1_udf(F.col(c1_col)))


def explode_addresses(df: DataFrame, id_col: str) -> DataFrame:
    """One row per parsed address (the mention table for affiliation /
    country disambiguation)."""
    return (
        with_addresses(df)
        .select(id_col, F.posexplode("addresses").alias("addr_pos", "a"))
        .select(
            id_col,
            "addr_pos",
            F.col("a.authors").alias("authors"),
            F.col("a.institution").alias("institution"),
            F.col("a.country").alias("country"),
            F.col("a.raw").alias("raw"),
        )
    )


def make_replace_country_udf(mapping: dict[str, str]):
    """C1 rewrite: replace country tokens by the mapping, preserving
    '[author]' prefixes (c1_utils.py:314-418).  ``mapping`` keys/values are
    canonical-country strings; it is captured in the UDF closure, which Spark
    broadcasts with the task — pass a plain dict."""

    def rewrite_cell(cell: str) -> str:
        parts = split_c1(cell)
        out = []
        for addr in parts:
            m = _BRACKET_RE.match(addr)
            prefix, rest = ("", addr)
            if m:
                prefix = "[" + m.group("authors") + "] "
                rest = m.group("rest")
            segs = [s.strip() for s in rest.split(",")]
            if segs:
                canon = canonical_country(segs[-1])
                if canon in mapping:
                    segs[-1] = mapping[canon]
            out.append(prefix + ", ".join(segs))
        return "; ".join(out)

    @pandas_udf(T.StringType())
    def replace_country_udf(cells: pd.Series) -> pd.Series:
        return cells.fillna("").map(rewrite_cell)

    return replace_country_udf


def country_counts(df: DataFrame, id_col: str) -> DataFrame:
    """Per-country publication counts over parsed addresses (the country
    disambiguation 'facet')."""
    return (
        explode_addresses(df, id_col)
        .filter(F.col("country") != "")
        .groupBy("country")
        .agg(F.countDistinct(id_col).alias("n_records"))
    )
