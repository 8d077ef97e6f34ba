"""C1 (author-address) parsing and standardization, Spark-first.

Reference parity (packages/bibex_core/modules/c1_utils.py):
  country variants + canon    :16-75 (COUNTRY_VARIANTS lowercase-keyed ->
                               canonical Title-Case English; a token that is
                               neither a variant nor already canonical maps
                               to None — never guessed)
  bracket-aware ';' split     :191-222 (split_c1_addresses — ';' inside
                               '[Author; Other]' prefixes must not split)
  geographic strip            :143-153 (_looks_geographic: postal-code
                               digits, US state tokens)
  org-keyword institution     :156-185 (_is_org: long keywords by prefix,
                               short/risky abbreviations by exact token;
                               _is_subunit excludes departments/faculties)
  address parse               :225-257 (parse_c1_address: country = last
                               comma part IF canonical, strip trailing
                               geography, institution = rightmost org part
                               preferring non-subunits; NO keyword hit ->
                               institution None — never a guessed city)
  org rollup                  :268-283 (rollup_c1_to_parent)
  rewrite family              :286-330 (replace_country_in_c1, preserving
                               '[author]' prefixes)

All scalar logic lives in plain-python helpers shared by the Arrow-batched
pandas UDFs and the golden-oracle builder; the per-address logic is
regex/string work unsuited to native exprs, but it ships once per executor.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

#: country variant (lowercase) -> canonical English name (c1_utils.py:16-46)
COUNTRY_VARIANTS = {
    "usa": "United States", "u.s.a.": "United States", "u.s.a": "United States",
    "us": "United States", "u.s.": "United States", "u s a": "United States",
    "united states of america": "United States", "america": "United States",
    "united states": "United States",
    "uk": "United Kingdom", "u.k.": "United Kingdom",
    "great britain": "United Kingdom", "england": "United Kingdom",
    "scotland": "United Kingdom", "wales": "United Kingdom",
    "northern ireland": "United Kingdom", "north ireland": "United Kingdom",
    "united kingdom": "United Kingdom",
    "peoples r china": "China", "p r china": "China", "prc": "China",
    "peoples republic of china": "China", "china": "China",
    "mainland china": "China",
    "south korea": "South Korea", "korea": "South Korea",
    "republic of korea": "South Korea", "korea rep": "South Korea",
    "korea (south)": "South Korea",
    "north korea": "North Korea", "dprk": "North Korea",
    "russia": "Russia", "russian federation": "Russia", "ussr": "Russia",
    "turkiye": "Turkey", "türkiye": "Turkey", "turkey": "Turkey",
    "iran": "Iran", "islamic republic of iran": "Iran",
    "czechia": "Czech Republic", "czech republic": "Czech Republic",
    "netherlands": "Netherlands", "the netherlands": "Netherlands",
    "holland": "Netherlands",
    "uae": "United Arab Emirates", "u arab emirates": "United Arab Emirates",
    "united arab emirates": "United Arab Emirates",
    "germany": "Germany", "deutschland": "Germany", "fed rep ger": "Germany",
    "viet nam": "Vietnam", "vietnam": "Vietnam",
    "taiwan": "Taiwan", "rep of china": "Taiwan",
    "hong kong": "Hong Kong", "macau": "Macau", "macao": "Macau",
    "saudi arabia": "Saudi Arabia", "ksa": "Saudi Arabia",
    "brasil": "Brazil", "brazil": "Brazil",
    "espana": "Spain", "españa": "Spain", "spain": "Spain",
    "cote d'ivoire": "Ivory Coast", "ivory coast": "Ivory Coast",
}

#: names already canonical (pass through unchanged; c1_utils.py:49-60)
CANONICAL_COUNTRIES = set(COUNTRY_VARIANTS.values()) | {
    "France", "Italy", "Japan", "Canada", "Australia", "India", "Mexico",
    "Poland", "Sweden", "Norway", "Denmark", "Finland", "Belgium", "Austria",
    "Switzerland", "Portugal", "Greece", "Ireland", "Israel", "Egypt",
    "Pakistan", "Indonesia", "Malaysia", "Thailand", "Singapore",
    "Philippines", "Argentina", "Chile", "Colombia", "Peru", "South Africa",
    "Nigeria", "Kenya", "Morocco", "Romania", "Hungary", "Ukraine",
    "Bulgaria", "Croatia", "Serbia", "Slovenia", "Slovakia", "Lithuania",
    "Latvia", "Estonia", "Qatar", "Kuwait", "Jordan", "Lebanon", "Iraq",
    "New Zealand", "Bangladesh", "Sri Lanka", "Nepal",
}
_CANON_LOWER = {c.lower(): c for c in CANONICAL_COUNTRIES}

#: long, distinctive org keywords — prefix match is safe (c1_utils.py:158-162)
_ORG_KW_PREFIX = (
    "univ", "institut", "college", "hospital", "clinic", "center", "centre",
    "laborator", "academ", "polytech", "hochschule", "universidad",
    "universita", "ministr", "council", "foundation", "klinik",
)
#: short / risky abbreviations — exact-token match only (c1_utils.py:168-171)
_ORG_KW_EXACT = (
    "inst", "coll", "hosp", "ctr", "lab", "acad", "natl", "fdn", "sch",
    "dept", "polytechnic", "school", "laboratory", "spital",
)
#: sub-unit markers (NOT a parent institution; c1_utils.py:70-74)
_SUBUNIT_KW = (
    "depart", "dept", "division", " div ", "faculty", " fac ", "school of",
    "section", "chair", "unit", "program", "laboratory of",
)
_POSTAL_RE = re.compile(r"\d{4,6}")
_US_STATES = {
    "AL", "AK", "AZ", "AR", "CA", "CO", "CT", "DE", "FL", "GA", "HI", "ID",
    "IL", "IN", "IA", "KS", "KY", "LA", "ME", "MD", "MA", "MI", "MN", "MS",
    "MO", "MT", "NE", "NV", "NH", "NJ", "NM", "NY", "NC", "ND", "OH", "OK",
    "OR", "PA", "RI", "SC", "SD", "TN", "TX", "UT", "VT", "VA", "WA", "WV",
    "WI", "WY", "DC",
}

_BRACKET_RE = re.compile(r"^\s*\[(?P<authors>[^\]]*)\]\s*(?P<rest>.*)$", re.S)


def canonical_country(raw: str) -> str | None:
    """Country variant -> canonical English name, or None when the token is
    neither a known variant nor already canonical (c1_utils.py:95-104 —
    never guess; unknown tokens stay Tier 2)."""
    t = re.sub(r"\s+", " ", str(raw or "")).strip().lower().rstrip(".")
    if not t:
        return None
    if t in COUNTRY_VARIANTS:
        return COUNTRY_VARIANTS[t]
    return _CANON_LOWER.get(t)


def _looks_geographic(part: str) -> bool:
    """Trailing city/state/postal component (c1_utils.py:143-153)."""
    p = part.strip()
    if not p:
        return True
    if _POSTAL_RE.search(p):
        return True
    toks = p.replace(",", " ").split()
    return any(tk.upper() in _US_STATES for tk in toks)


def _is_org(part: str) -> bool:
    """Parent-institution detector (c1_utils.py:173-181): long keywords by
    token prefix, short abbreviations by exact token."""
    toks = re.findall(r"[a-zçğıöşü]+", part.lower())
    if not toks:
        return False
    if set(toks) & set(_ORG_KW_EXACT):
        return True
    return any(tok.startswith(pfx) for tok in toks for pfx in _ORG_KW_PREFIX)


def _is_subunit(part: str) -> bool:
    low = part.lower()
    return any(kw in low for kw in _SUBUNIT_KW)


def split_c1(cell: str) -> list[str]:
    """Bracket-aware split of a C1 cell on ';' (c1_utils.py:191-222):
    semicolons inside '[...]' author prefixes do not split.  The '[author]'
    prefix is KEPT (parse_address extracts it into the struct)."""
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
    """One address -> (authors, institution, country) with the reference's
    exact extraction rules (parse_c1_address, c1_utils.py:225-257):

      country      last comma part IF it canonicalizes, else None
      geography    trailing city/state/postal parts stripped
      institution  rightmost org-keyword part that is not a sub-unit;
                   fallback rightmost org-keyword part; else None (NEVER a
                   guessed city — Tier-2 territory)
    """
    m = _BRACKET_RE.match(str(addr or ""))
    authors, rest = ("", str(addr or ""))
    if m:
        authors, rest = m.group("authors").strip(), m.group("rest").strip()
    parts = [p.strip() for p in rest.split(",") if p.strip()]

    country = None
    if parts:
        c = canonical_country(parts[-1])
        if c:
            country = c
            parts = parts[:-1]
    while parts and _looks_geographic(parts[-1]):
        parts.pop()

    institution = None
    for p in reversed(parts):
        if _is_org(p) and not _is_subunit(p):
            institution = p
            break
    if institution is None:
        for p in reversed(parts):
            if _is_org(p):
                institution = p
                break

    return {
        "authors": authors,
        "institution": institution,
        "country": country,
        "raw": str(addr or ""),
    }


def rollup_address(addr: str) -> str:
    """One address -> 'Institution, Country' parent form, or the original
    address when no institution parses (rollup_c1_to_parent inner loop,
    c1_utils.py:268-283)."""
    info = parse_address(addr)
    inst, country = info["institution"], info["country"]
    if inst and country:
        return f"{inst}, {country}"
    if inst:
        return inst
    return str(addr or "")


def rollup_c1(cell: str) -> str:
    """Whole C1 cell -> parent-institution rollup, order-preserving dedup
    (c1_utils.py:268-283)."""
    rolled = [rollup_address(a) for a in split_c1(cell)]
    seen: set[str] = set()
    return "; ".join(x for x in rolled if not (x in seen or seen.add(x)))


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


@pandas_udf(T.StringType())
def rollup_c1_udf(cells: pd.Series) -> pd.Series:
    """C1 cell -> parent-institution rollup string."""
    return cells.fillna("").map(rollup_c1)


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
    '[author]' prefixes (replace_country_in_c1, c1_utils.py:286-330).
    ``mapping`` keys are canonical-country strings; it is captured in the
    UDF closure, which Spark broadcasts with the task — pass a plain dict."""

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
                if canon and canon in mapping:
                    segs[-1] = mapping[canon]
            out.append(prefix + ", ".join(segs))
        return "; ".join(out)

    @pandas_udf(T.StringType())
    def replace_country_udf(cells: pd.Series) -> pd.Series:
        return cells.fillna("").map(rewrite_cell)

    return replace_country_udf


def country_counts(df: DataFrame, id_col: str) -> DataFrame:
    """Per-country publication counts over parsed addresses (the country
    disambiguation 'facet').  Only dictionary-canonical countries count —
    unknown tokens are Tier-2, never guessed (reference rule)."""
    return (
        explode_addresses(df, id_col)
        .filter(F.col("country").isNotNull())
        .groupBy("country")
        .agg(F.countDistinct(id_col).alias("n_records"))
    )
