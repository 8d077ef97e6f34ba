"""Export sinks: WoS tagged text, VOSviewer TSV, RIS, BibTeX, CSV/TSV/parquet.

Reference parity:
  * format dispatch       — apps/api/services/exporter.py:45-104 (``export``)
  * WoS plain-text sink   — packages/bibex_core/xlsx2vos.py:4-185
  * VOSviewer TSV         — exporter.py:88-93 (fixed column subset, tab sep)
  * RIS                   — apps/api/services/ris_writer.py:1-98
  * BibTeX                — apps/api/services/bibtex_writer.py:1-98

All row formatting is built from JVM-side column expressions
(``concat_ws``/``format_string``) — the DataFrame carries one ``text`` column
per record and ``df.write.text`` streams it out; no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: VOSviewer needs this fixed column subset (semantic parity exporter.py:88-93)
VOS_COLUMNS = ["AU", "TI", "SO", "PY", "TC", "DI", "AB", "DE", "ID", "C1", "CR"]

#: WoS tag emission order for the text sink
WOS_TAG_ORDER = [
    "PT", "AU", "AF", "TI", "SO", "LA", "DT", "DE", "ID", "AB", "C1", "CR",
    "TC", "PY", "VL", "IS", "BP", "EP", "DI", "SN", "UT",
]

_RIS_MAP = {
    "TI": "TI", "AU": "AU", "PY": "PY", "SO": "JO", "VL": "VL", "IS": "IS",
    "BP": "SP", "EP": "EP", "DI": "DO", "AB": "AB", "SN": "SN", "DE": "KW",
}


def _present(df: DataFrame, cols: list[str]) -> list[str]:
    return [c for c in cols if c in df.columns]


def _tagged_line(tag: str, col) -> F.Column:
    """'<TAG> value' for non-empty multi-line-capable values, else NULL."""
    v = F.trim(col.cast("string"))
    return F.when(
        v.isNotNull() & (v != "") & (F.upper(v) != "NAN"),
        F.concat(F.lit(tag + " "), F.regexp_replace(v, "---", "\n   ")),
    )


def to_wos_text(df: DataFrame) -> DataFrame:
    """One ``text`` column per record in FN/PT../ER tagged layout."""
    parts = [F.lit("PT J") if "PT" not in df.columns else _tagged_line("PT", F.col("PT"))]
    for tag in WOS_TAG_ORDER[1:]:
        if tag in df.columns:
            col = F.col(tag)
            if tag in ("AU", "AF", "DE", "ID"):  # multi-value: one line per item
                col = F.array_join(F.split(col.cast("string"), "; "), "\n   ")
            parts.append(_tagged_line(tag, col))
    body = F.concat_ws("\n", F.array_compact(F.array(*parts)))
    return df.select(F.concat(body, F.lit("\nER\n")).alias("text"))


def write_wos_text(df: DataFrame, path: str) -> None:
    to_wos_text(df).coalesce(1).write.mode("overwrite").text(path)


def to_vos_tsv(df: DataFrame) -> DataFrame:
    return df.select(*_present(df, VOS_COLUMNS))


def write_vos_tsv(df: DataFrame, path: str) -> None:
    to_vos_tsv(df).write.mode("overwrite").option("sep", "\t").option(
        "header", True
    ).csv(path)


def to_ris_text(df: DataFrame) -> DataFrame:
    parts = [F.lit("TY  - JOUR")]
    for src, ris in _RIS_MAP.items():
        if src in df.columns:
            col = F.col(src).cast("string")
            if src in ("AU", "DE"):
                col = F.array_join(
                    F.transform(
                        F.split(col, "; "), lambda x: F.concat(F.lit(ris + "  - "), x)
                    ),
                    "\n",
                )
                parts.append(F.when((F.trim(col) != ""), col))
            else:
                parts.append(
                    F.when(
                        col.isNotNull() & (F.trim(col) != ""),
                        F.concat(F.lit(ris + "  - "), col),
                    )
                )
    body = F.concat_ws("\n", F.array_compact(F.array(*parts)))
    return df.select(F.concat(body, F.lit("\nER  - \n")).alias("text"))


def write_ris(df: DataFrame, path: str) -> None:
    to_ris_text(df).coalesce(1).write.mode("overwrite").text(path)


_BIBTEX_FIELDS = {
    "TI": "title", "SO": "journal", "PY": "year", "VL": "volume",
    "IS": "number", "DI": "doi", "AB": "abstract", "SN": "issn",
}


def _latex_escape(col) -> F.Column:
    """Escape BibTeX-special characters (parity bibtex_writer.py:16-27)."""
    out = col.cast("string")
    for ch, rep in (("\\", "\\\\textbackslash "), ("&", "\\\\&"), ("%", "\\\\%"),
                    ("$", "\\\\$"), ("#", "\\\\#"), ("_", "\\\\_"),
                    ("{", "\\\\{"), ("}", "\\\\}")):
        out = F.regexp_replace(out, "\\" + ch if ch in "\\$#{}" else ch, rep)
    return out


def to_bibtex_text(df: DataFrame, id_col: str | None = None) -> DataFrame:
    """One BibTeX entry per record; keys made unique from a stable id."""
    key = (
        F.col(id_col).cast("string")
        if id_col and id_col in df.columns
        else F.sha2(F.concat_ws("|", *[F.coalesce(F.col(c).cast("string"), F.lit(""))
                                       for c in df.columns]), 256).substr(1, 12)
    )
    parts = [F.concat(F.lit("@article{"), key, F.lit(","))]
    for src, field in _BIBTEX_FIELDS.items():
        if src in df.columns:
            v = _latex_escape(F.col(src))
            parts.append(
                F.when(
                    v.isNotNull() & (F.trim(v) != ""),
                    F.concat(F.lit(f"  {field} = {{"), v, F.lit("}},".replace("}}", "}"))),
                )
            )
    if "AU" in df.columns:
        authors = F.array_join(F.split(F.col("AU").cast("string"), "; "), " and ")
        parts.insert(1, F.concat(F.lit("  author = {"), _latex_escape(authors), F.lit("},")))
    body = F.concat_ws("\n", F.array_compact(F.array(*parts)))
    return df.select(F.concat(body, F.lit("\n}\n")).alias("text"))


def write_bibtex(df: DataFrame, path: str) -> None:
    to_bibtex_text(df).coalesce(1).write.mode("overwrite").text(path)


def export(df: DataFrame, path: str, fmt: str) -> None:
    """Format dispatch (parity exporter.py:45-104)."""
    fmt = fmt.lower()
    if fmt == "csv":
        df.write.mode("overwrite").option("header", True).csv(path)
    elif fmt == "tsv":
        df.write.mode("overwrite").option("header", True).option("sep", "\t").csv(path)
    elif fmt == "parquet":
        df.write.mode("overwrite").parquet(path)
    elif fmt == "vos":
        write_vos_tsv(df, path)
    elif fmt == "wos":
        write_wos_text(df, path)
    elif fmt == "ris":
        write_ris(df, path)
    elif fmt == "bibtex":
        write_bibtex(df, path)
    elif fmt == "xlsx":
        # XLSX needs openpyxl (not shipped in this environment); gate cleanly
        try:
            import openpyxl  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "xlsx export requires openpyxl; use csv/tsv/parquet here"
            ) from exc
        # single-file spreadsheet = driver-collected by contract (the
        # reference writes one merged.xlsx); cap the collect so a mistargeted
        # 100-TB table errors instead of OOMing the driver
        cap = 1_048_575  # XLSX sheet ceiling (1,048,576) minus the header row
        n = df.limit(cap + 1).count()
        if n > cap:
            raise ValueError(
                f"xlsx export capped at {cap} rows (XLSX sheet limit); "
                "use parquet/csv for larger tables"
            )
        df.toPandas().to_excel(path, index=False)
    else:
        raise ValueError(f"unknown export format: {fmt}")
