"""WoS ISI tagged-text scan, Spark-first.

Reference semantics (packages/bibex_core/wos2xlsx.py:21-114 ``isi2df``): a
WoS export is a line stream of 2-letter tag records; documents are delimited
by ``PT`` lines and terminated by ``ER``; continuation lines (leading
whitespace / blank tag) attach to the previous tag; per-(doc, tag) lines are
``'---'``-joined and pivoted to one wide row per document; everything except
``DI`` is uppercased.

Spark plan: files -> (file, line_no, line) preserving in-file order (via
``wholeTextFiles``: tagged exports are many small-ish files, so per-file
parallelism is the natural unit and line order is exact) -> running count of
``PT `` markers as doc id (window cumulative sum) -> forward-fill tag
(window ``last(ignorenulls)``) -> groupBy(doc, tag) ordered concat ->
groupBy(doc) pivot(tag).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W

#: structural tags that never become columns
_STRUCTURAL = ("FN", "VR", "ER", "EF")


def read_lines_ordered(spark: SparkSession, path: str) -> DataFrame:
    """(file, line_no, line) with exact in-file ordering."""
    rdd = spark.sparkContext.wholeTextFiles(path)
    lines = rdd.flatMap(
        lambda kv: [
            (kv[0], i, ln) for i, ln in enumerate(kv[1].split("\n"))
        ]
    )
    schema = T.StructType(
        [
            T.StructField("file", T.StringType(), False),
            T.StructField("line_no", T.LongType(), False),
            T.StructField("line", T.StringType(), True),
        ]
    )
    return spark.createDataFrame(lines, schema)


def read_wos_tagged(spark: SparkSession, path: str) -> DataFrame:
    """Parse WoS tagged export(s) into one wide row per document."""
    lines = read_lines_ordered(spark, path).filter(F.length("line") > 0)

    w_file = W.partitionBy("file").orderBy("line_no")
    tagged = (
        lines.withColumn("head", F.substring("line", 1, 2))
        .withColumn("rest", F.ltrim(F.substring("line", 4, 1_000_000)))
        .withColumn(
            "tag_raw",
            F.when(F.col("head").rlike("^[A-Z][A-Z0-9] ?$") |
                   F.col("head").isin(*_STRUCTURAL), F.col("head")).otherwise(F.lit(None)),
        )
        # continuation lines ("   more text") carry the previous tag
        .withColumn("tag", F.last("tag_raw", ignorenulls=True).over(w_file))
        .withColumn(
            "value",
            F.when(F.col("tag_raw").isNotNull(), F.col("rest")).otherwise(
                F.ltrim("line")
            ),
        )
        .withColumn(
            "doc_id",
            F.sum(F.when(F.col("tag_raw") == "PT", 1).otherwise(0)).over(w_file),
        )
        .filter(F.col("doc_id") > 0)
        .filter(~F.col("tag").isin(*_STRUCTURAL) | (F.col("tag") == "ER"))
    )
    # document ends at ER: drop trailing structural rows
    body = tagged.filter(~F.col("tag").isin(*_STRUCTURAL))

    per_tag = body.groupBy("file", "doc_id", "tag").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("line_no", "value"))),
                lambda s: s["value"],
            ),
            "---",
        ).alias("val")
    )
    tags = [r["tag"] for r in per_tag.select("tag").distinct().collect()]
    wide = (
        per_tag.groupBy("file", "doc_id")
        .pivot("tag", sorted(tags))
        .agg(F.first("val"))
    )
    # reference post-processing (wos2xlsx.py:73-110):
    #   AU/AF/CR: '---' -> ';' (one author / citation per separator)
    #   all other tags: '---' -> ' ' + trim (continuation lines space-join)
    #   C1raw = space-joined C1; C1 = bracket-strip + '.' -> '.;'
    #   AU: ',' -> ' ' (comma strip)   DB = 'ISI'
    #   uppercase every text column except DI
    comma_tags = ("AU", "AF", "CR")
    for c in wide.columns:
        if c in ("file", "doc_id"):
            continue
        if c in comma_tags:
            wide = wide.withColumn(c, F.replace(F.col(c), F.lit("---"), F.lit(";")))
        else:
            wide = wide.withColumn(
                c, F.trim(F.replace(F.col(c), F.lit("---"), F.lit(" ")))
            )
    if "C1" in wide.columns:
        wide = wide.withColumn("C1raw", F.col("C1")).withColumn(
            "C1",
            F.replace(
                F.regexp_replace("C1", r"\[.*?\]", ""), F.lit("."), F.lit(".;")
            ),
        )
    if "AU" in wide.columns:
        wide = wide.withColumn(
            "AU", F.trim(F.replace(F.col("AU"), F.lit(","), F.lit(" ")))
        )
    wide = wide.withColumn("DB", F.lit("ISI"))
    for c in wide.columns:
        if c not in ("file", "doc_id", "DI"):
            wide = wide.withColumn(c, F.upper(F.col(c)))
    return wide


# ---------------------------------------------------------------------------
# deterministic synthetic sample (replaces the reference's bundled corpus)
# ---------------------------------------------------------------------------

def write_sample_wos(path: str, n_docs: int = 25, seed: int = 7) -> str:
    """Generate a small deterministic WoS-like tagged export for tests."""
    import os

    import numpy as np

    if os.path.exists(path):
        return path
    rng = np.random.default_rng(seed)
    words = "spark shuffle merge dedup cluster band salt verify".split()
    # real WoS-style country variants (canonicalizable per c1_utils dicts)
    countries = ["USA", "Peoples R China", "England", "Turkiye", "Germany"]
    # institution variants: idx 1/2 are JW-close spellings of idx 0 (the
    # affiliation-clustering signal); idx 3 is distinct
    insts = ["Univ Example", "Univ Examples", "Univ Exampl", "Acad Sinica Inst"]
    # research-field signal (WC) for author-split detection: Author3 appears
    # in two field-disjoint groups (physics docs vs biology docs)
    fields = ["Physics, Applied", "Biology", "Computer Science", "Mathematics"]
    out = ["FN Synthetic Export", "VR 1.0"]
    for i in range(n_docs):
        title_words = rng.choice(words, size=6)
        country = countries[i % len(countries)]
        inst = insts[i % len(insts)]
        # Author3 spans disjoint fields: docs 3, 8 get Physics; 13, 18 Biology
        au_extra = "Author3, S." if i in (8, 13, 18) else f"Coauthor{i}, B."
        wc = "Physics, Applied" if i in (3, 8) else (
            "Biology" if i in (13, 18) else fields[i % len(fields)]
        )
        out += [
            "PT J",
            f"AU Author{i}, A.",
            f"   {au_extra}",
            "TI " + " ".join(title_words[:3]),
            "   " + " ".join(title_words[3:]),
            f"SO JOURNAL OF {words[i % len(words)].upper()}",
            f"PY {1990 + (i % 30)}",
            f"DI 10.{1000 + i}/synthetic.{i}",
            f"TC {int(rng.integers(0, 100))}",
            f"C1 [Author{i}, A.] {inst}, Dept Data, Springfield, {country}.",
            f"WC {wc}",
            "ER",
        ]
    out.append("EF")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(out) + "\n")
    os.replace(tmp, path)
    return path
