"""Scopus CSV scan, Spark-first.

Reference semantics (packages/bibex_core/scp2xlsx.py:65-150
``csvScopus2df``): read every CSV as all-string, keep only columns common to
all files, concatenate, rename Scopus headers to WoS 2-letter tags, uppercase
text columns.

Spark plan: ``spark.read.csv(header=True)`` per file ->
``unionByName(allowMissingColumns=False)`` over the common-column projection
-> ``withColumnsRenamed`` from the public Scopus->WoS field correspondence.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: public Scopus-export header -> WoS tag correspondence (standard
#: bibliometrics field mapping; semantic parity with scp2xlsx.py:13-62)
SCOPUS_TO_WOS = {
    "Authors": "AU",
    "Author full names": "AF",
    "Title": "TI",
    "Year": "PY",
    "Source title": "SO",
    "Volume": "VL",
    "Issue": "IS",
    "Page start": "BP",
    "Page end": "EP",
    "Cited by": "TC",
    "DOI": "DI",
    "Link": "UR",
    "Affiliations": "C1",
    "Authors with affiliations": "C1raw",
    "Abstract": "AB",
    "Author Keywords": "DE",
    "Index Keywords": "ID",
    "References": "CR",
    "ISSN": "SN",
    "ISBN": "BN",
    "PubMed ID": "PM",
    "Language of Original Document": "LA",
    "Document Type": "DT",
    "Source": "DB",
    "EID": "UT",
}


def read_scopus_csv(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Multi-file Scopus CSV -> one WoS-tagged DataFrame."""
    dfs = [
        spark.read.option("header", True)
        .option("inferSchema", False)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(p)
        for p in paths
    ]
    common = reduce(lambda a, b: a & b, (set(d.columns) for d in dfs))
    ordered = [c for c in dfs[0].columns if c in common]
    unioned = reduce(
        lambda a, b: a.unionByName(b), (d.select(*ordered) for d in dfs)
    )
    renames = {c: SCOPUS_TO_WOS[c] for c in ordered if c in SCOPUS_TO_WOS}
    out = unioned.withColumnsRenamed(renames)
    for c in out.columns:
        if c not in ("DI", "UR", "C1raw"):
            out = out.withColumn(c, F.upper(F.col(c)))
    return out


def write_sample_scopus(dirpath: str, seed: int = 11) -> list[str]:
    """Two deterministic Scopus-like CSVs with partially-overlapping columns."""
    import csv
    import os

    import numpy as np

    os.makedirs(dirpath, exist_ok=True)
    p1, p2 = os.path.join(dirpath, "scopus_a.csv"), os.path.join(dirpath, "scopus_b.csv")
    if os.path.exists(p1) and os.path.exists(p2):
        return [p1, p2]
    rng = np.random.default_rng(seed)
    words = "graph join shuffle spill codegen prune".split()

    def rows(n, offset, extra_col):
        hdr = ["Authors", "Title", "Year", "Source title", "DOI", "Cited by"]
        if extra_col:
            hdr.append(extra_col)
        data = [hdr]
        for i in range(n):
            if offset == 0 and i < 5:
                # overlap with the WoS sample (same DOI, Scopus-styled
                # fields) so the cross-database Smart Merge finds matches
                r = [
                    f"Author{i}, A.",
                    f"wos-shared record {i}",
                    str(1990 + (i % 30)),  # same year as the WoS sample doc i
                    f"Journal of {words[i % len(words)]}",
                    f"10.{1000 + i}/synthetic.{i}",
                    str(int(rng.integers(0, 50))),
                ]
            else:
                r = [
                    f"Writer{offset + i} W.",
                    " ".join(rng.choice(words, size=4)),
                    str(1995 + int(rng.integers(0, 25))),
                    f"Journal of {words[(offset + i) % len(words)]}",
                    f"10.{2000 + offset + i}/scp.{offset + i}",
                    str(int(rng.integers(0, 50))),
                ]
            if extra_col:
                r.append("x")
            data.append(r)
        return data

    for p, n, off, extra in ((p1, 12, 0, "Abstract"), (p2, 8, 100, None)):
        with open(p + ".tmp", "w", newline="") as f:
            csv.writer(f).writerows(rows(n, off, extra))
        os.replace(p + ".tmp", p)
    return [p1, p2]
