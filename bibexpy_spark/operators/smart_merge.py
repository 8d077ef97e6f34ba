"""Smart Merge: WoS x Scopus record deduplication + field merge, Spark-first.

Re-expresses the reference's merge core (apps/api/services/smart_merger.py,
``run_smart_merge`` :576-827) as a declarative DataFrame pipeline:

  normalize   8 shadow columns per side (:612-620) -> native exprs + UDFs
  block       key = (norm_year, surname initial) (:185-198)
  negative    both DOIs present & different -> pair rejected (:205-240)
  stages      1 DOI exact (conf 1.0, :253-265)
              2 PMID exact (conf 0.99, :267-279; UT is never cross-db)
              3 title JW>=0.92 & |Δyear|<=1 & same surname (conf 0.95, :281-307)
              (3-5 gated on BOTH titles nonempty, :282)
              4 journal JW>=0.90 & vol & page (conf 0.90, :309-334)
              5 borderline band 0.80<=JW<0.92 -> review queue (:336-348)
  assign      greedy confidence-desc 1:1 (:654-711) -> replaced by the
              order-independent SYMMETRIC BEST MATCH (a pair survives iff it
              is the top-ranked candidate of BOTH endpoints; rank =
              (-confidence, partner id) via two row_number windows) — the
              reference's greedy loop is sequential by construction and
              cannot scale; symmetric-best is its deterministic fixpoint for
              non-conflicting data
  merge       per-field preference table (Caputo 2024 fixed table, :40-57)
              via coalesce/union exprs (:388-458) + conflict log (:717-736)
  assemble    merged ∪ lost-WoS ∪ lost-Scopus (:738-753)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from bibexpy_spark.functions import bibex_norms as bn

#: per-field merge preference — exact parity with the reference's fixed
#: Caputo-2024 table (smart_merger.py:40-57): citation metrics / reference
#: lists from WoS, abstract / author lists / affiliations from Scopus,
#: keyword unions, WC/SC cross-fill wos-first; every other field defaults to
#: wos_first (DEFAULT_PREFERENCE, smart_merger.py:58).
FIELD_PREFERENCES = {
    "TC": "wos", "CR": "wos", "NR": "wos",
    "AB": "scopus", "AU": "scopus", "AF": "scopus", "C1": "scopus",
    "DE": "union", "ID": "union",
    "WC": "cross_fill_wos_first", "SC": "cross_fill_wos_first",
}
DEFAULT_PREFERENCE = "wos_first"

BORDERLINE_LOW, STAGE3_T, STAGE4_T = 0.80, 0.92, 0.90


def with_norm_columns(df: DataFrame) -> DataFrame:
    """The 8 normalized shadow columns (parity smart_merger.py:612-620)."""
    out = df
    if "DI" in df.columns:
        out = out.withColumn("_norm_doi", bn.normalize_doi(F.col("DI")))
    if "PY" in df.columns:
        out = out.withColumn("_norm_year", bn.normalize_year(F.col("PY")))
    if "TI" in df.columns:
        out = out.withColumn("_norm_title", bn.normalize_title_udf(F.col("TI")))
    if "AU" in df.columns:
        out = out.withColumn("_norm_surname", bn.normalize_surname_udf(F.col("AU")))
    if "SO" in df.columns:
        out = out.withColumn("_norm_journal", bn.normalize_name_udf(F.col("SO")))
    if "SN" in df.columns:
        out = out.withColumn("_norm_issn", bn.normalize_issn(F.col("SN")))
    for tag, name in (("PM", "_norm_pmid"), ("UT", "_norm_ut")):
        if tag in df.columns:
            out = out.withColumn(name, bn.normalize_id_token(F.col(tag)))
    if "VL" in df.columns:
        out = out.withColumn("_norm_vol", bn.normalize_id_token(F.col("VL")))
    if "BP" in df.columns:
        out = out.withColumn("_norm_page", bn.normalize_id_token(F.col("BP")))
    return out


def _block_key():
    """(norm_year, surname initial) blocking key (smart_merger.py:185-198)."""
    return F.concat_ws(
        "|",
        F.coalesce(F.col("_norm_year").cast("string"), F.lit("?")),
        F.coalesce(F.substring("_norm_surname", 1, 1), F.lit("?")),
    )


def candidate_pairs(wos: DataFrame, scp: DataFrame) -> DataFrame:
    """Blocked candidate join with prefixed columns (w_*, s_*)."""
    wkeyed = wos.select(
        F.col("_row_id").alias("w_id"),
        _block_key().alias("block_key"),
        *[F.col(c).alias(f"w{c}") for c in wos.columns if c != "_row_id"],
    )
    skeyed = scp.select(
        F.col("_row_id").alias("s_id"),
        _block_key().alias("block_key"),
        *[F.col(c).alias(f"s{c}") for c in scp.columns if c != "_row_id"],
    )
    return wkeyed.join(skeyed, "block_key")


def score_pairs(pairs: DataFrame) -> DataFrame:
    """Staged match predicates -> (stage, confidence, is_borderline).

    Negative rule first; exact-id stages before fuzzy stages (the manual
    predicate ordering the reference relies on, smart_merger.py:243-350 —
    kept explicit because the JW UDF is opaque to Catalyst).
    """
    def _nonempty(col: str):
        return F.col(col).isNotNull() & (F.col(col) != "")

    # negative rules (negative_rule_check, smart_merger.py:205-227): both
    # sides carry the SAME strong identifier kind with DIFFERENT values ->
    # the pair is rejected outright — never matched, never borderline.
    # Applies to DOI, PMID and ISSN; UT/EID is deliberately NOT a negative
    # rule (WoS UT and Scopus EID are different id spaces).
    p = pairs
    for ident in ("doi", "pmid", "issn"):
        wcol, scol = f"w_norm_{ident}", f"s_norm_{ident}"
        if wcol in p.columns and scol in p.columns:
            p = p.filter(
                ~(_nonempty(wcol) & _nonempty(scol) & (F.col(wcol) != F.col(scol)))
            )

    have_doi = "w_norm_doi" in pairs.columns and "s_norm_doi" in pairs.columns
    title_jw = bn.jaro_winkler_udf(F.col("w_norm_title"), F.col("s_norm_title"))
    journal_jw = bn.jaro_winkler_udf(F.col("w_norm_journal"), F.col("s_norm_journal"))
    year_close = (
        F.col("w_norm_year").isNotNull()
        & F.col("s_norm_year").isNotNull()
        & (F.abs(F.col("w_norm_year") - F.col("s_norm_year")) <= 1)
    )
    # surname match requires BOTH surnames nonempty (compute_match's
    # `bool(w_surname and s_surname and ...)`, smart_merger.py:289):
    # two missing-author records must not "agree" on the empty string.
    same_surname = (
        _nonempty("w_norm_surname")
        & _nonempty("s_norm_surname")
        & (F.col("w_norm_surname") == F.col("s_norm_surname"))
    )
    stage1 = (
        _nonempty("w_norm_doi") & (F.col("w_norm_doi") == F.col("s_norm_doi"))
    ) if have_doi else F.lit(False)
    stage2 = (
        _nonempty("w_norm_pmid") & (F.col("w_norm_pmid") == F.col("s_norm_pmid"))
    ) if "w_norm_pmid" in p.columns and "s_norm_pmid" in p.columns else F.lit(False)

    # stages 3-5 exist only inside compute_match's `if w_title and s_title`
    # block (smart_merger.py:282): records missing a title can match on
    # strong identifiers alone, never on fuzzy similarity.
    both_titles = _nonempty("w_norm_title") & _nonempty("s_norm_title")
    p = p.withColumn(
        "_title_jw", F.when(both_titles, title_jw).otherwise(F.lit(None))
    )
    stage3 = (
        both_titles & (F.col("_title_jw") >= STAGE3_T) & year_close & same_surname
    )

    have_journal = "w_norm_journal" in p.columns and "s_norm_journal" in p.columns
    both_journals = (
        _nonempty("w_norm_journal") & _nonempty("s_norm_journal")
        if have_journal
        else F.lit(False)
    )
    p = p.withColumn(
        "_journal_jw",
        F.when(stage1 | stage2 | stage3 | ~both_journals, F.lit(0.0)).otherwise(
            journal_jw
        )
        if have_journal
        else F.lit(0.0),
    )

    def _eq_if_present(name: str):
        wcol, scol = f"w_norm_{name}", f"s_norm_{name}"
        if wcol in p.columns and scol in p.columns:
            return _nonempty(wcol) & (F.col(wcol) == F.col(scol))
        return F.lit(False)

    # stage 4 (smart_merger.py:309-334): journal JW + exact volume + page
    # match — no extra title-JW floor beyond the nonempty-titles gate.
    stage4 = (
        both_titles
        & both_journals
        & (F.col("_journal_jw") >= STAGE4_T)
        & _eq_if_present("vol")
        & _eq_if_present("page")
    )
    # stage 5 borderline band (smart_merger.py:336-348): title JW alone
    # decides queue membership — the reference has NO year condition here.
    borderline = (
        both_titles
        & (F.col("_title_jw") >= BORDERLINE_LOW)
        & (F.col("_title_jw") < STAGE3_T)
    )
    # linear confidence scale for borderline band, rounded to 3 decimals
    # (smart_merger.py:337-339 `round(conf, 3)`)
    border_conf = F.round(
        0.70
        + (F.col("_title_jw") - BORDERLINE_LOW)
        * (0.85 - 0.70)
        / (STAGE3_T - BORDERLINE_LOW),
        3,
    )
    scored = p.withColumn(
        "stage",
        F.when(stage1, 1).when(stage2, 2).when(stage3, 3).when(stage4, 4)
        .when(borderline, 5),
    ).withColumn(
        "confidence",
        F.when(stage1, 1.0).when(stage2, 0.99).when(stage3, 0.95).when(stage4, 0.90)
        .when(borderline, border_conf),
    )
    return scored.filter(F.col("stage").isNotNull()).withColumn(
        "is_borderline", F.col("stage") == 5
    )


def assign_one_to_one(scored: DataFrame) -> DataFrame:
    """Symmetric best match: keep a pair iff it is rank 1 for both its WoS
    row and its Scopus row (rank by confidence desc, partner id asc)."""
    matches = scored.filter(~F.col("is_borderline"))
    w_rank = W.partitionBy("w_id").orderBy(F.desc("confidence"), F.asc("s_id"))
    s_rank = W.partitionBy("s_id").orderBy(F.desc("confidence"), F.asc("w_id"))
    return (
        matches.withColumn("_rw", F.row_number().over(w_rank))
        .withColumn("_rs", F.row_number().over(s_rank))
        .filter((F.col("_rw") == 1) & (F.col("_rs") == 1))
        .drop("_rw", "_rs")
    )


def assign_one_to_one_greedy(scored: DataFrame) -> DataFrame:
    """EXACT-GREEDY parity mode (reference smart_merger.py:654-711):
    confidence-ordered greedy 1:1 assignment, deterministic tie-break
    (-confidence, w_id, s_id).

    Every candidate pair lives inside one blocking key (both endpoints carry
    the same (year, initial) key by construction, candidate_pairs above), so
    the greedy conflict graph never crosses blocks and PER-BLOCK greedy via
    ``applyInPandas`` equals the reference's global confidence-ordered loop —
    distributed, one shuffle on block_key.  Divergence from the reference is
    limited to pairs with EXACTLY equal confidence, where the reference's
    order is its frame row order (an implementation artifact); ours is the
    deterministic (w_id, s_id).  On contested blocks (A's best is B while
    B's best is C) greedy matches by global confidence order where symmetric
    best match drops the asymmetric pair — golden-fixture-tested in
    tests/test_smart_merge.py."""
    matches = scored.filter(~F.col("is_borderline"))
    schema = matches.schema

    def _greedy(pdf):
        pdf = pdf.sort_values(
            ["confidence", "w_id", "s_id"], ascending=[False, True, True],
            kind="mergesort",
        )
        used_w: set = set()
        used_s: set = set()
        keep = []
        for i, w, s in zip(pdf.index, pdf["w_id"], pdf["s_id"]):
            if w in used_w or s in used_s:
                continue
            used_w.add(w)
            used_s.add(s)
            keep.append(i)
        return pdf.loc[keep]

    return matches.groupBy("block_key").applyInPandas(_greedy, schema=schema)


def merge_matched(assigned: DataFrame, fields: list[str]) -> DataFrame:
    """Per-field preference merge + conflict struct array
    (smart_merger.py:388-458, conflict log :717-736)."""
    cols = [F.col("w_id"), F.col("s_id"), F.col("stage"), F.col("confidence")]
    conflicts = []
    for f in fields:
        wcol, scol = F.col(f"w{f}"), F.col(f"s{f}")
        pref = FIELD_PREFERENCES.get(f, DEFAULT_PREFERENCE)
        w_empty = wcol.isNull() | (F.trim(wcol.cast("string")) == "") | (
            F.upper(wcol.cast("string")) == "NAN"
        )
        s_empty = scol.isNull() | (F.trim(scol.cast("string")) == "") | (
            F.upper(scol.cast("string")) == "NAN"
        )
        w_val = F.when(~w_empty, wcol.cast("string"))
        s_val = F.when(~s_empty, scol.cast("string"))
        if pref == "scopus":
            merged = F.coalesce(s_val, w_val)
        elif pref == "union":  # noqa: SIM114 — kept parallel to the reference table
            merged = F.array_join(
                F.array_distinct(
                    F.concat(
                        bn.split_multivalue(F.coalesce(w_val, F.lit(""))),
                        bn.split_multivalue(F.coalesce(s_val, F.lit(""))),
                    )
                ),
                "; ",
            )
            merged = F.when(merged != "", merged)
        else:  # "wos" / "wos_first" / "cross_fill_wos_first" all fall back
            merged = F.coalesce(w_val, s_val)
        cols.append(merged.alias(f))
        conflicts.append(
            F.when(
                ~w_empty & ~s_empty & (wcol.cast("string") != scol.cast("string")),
                F.struct(
                    F.lit(f).alias("field"),
                    wcol.cast("string").alias("wos_value"),
                    scol.cast("string").alias("scopus_value"),
                ),
            )
        )
    cols.append(F.array_compact(F.array(*conflicts)).alias("_conflicts"))
    return assigned.select(*cols)


def run_smart_merge(
    wos: DataFrame, scp: DataFrame, assignment: str = "symmetric"
) -> dict[str, DataFrame]:
    """Full merge: returns merged / lost_wos / lost_scopus / borderline /
    conflict_log / match_audit DataFrames (the analysis-folder artifact set,
    smart_merger.py:761-779).

    ``assignment``: 'symmetric' (default — order-independent symmetric best
    match, the scale-native fixpoint) or 'greedy' (exact reference parity:
    confidence-ordered greedy per block, smart_merger.py:654-711; the
    borderline queue then also follows the reference — pairs whose endpoint
    was consumed by a definite match are dropped from the queue)."""
    # callers may supply a stable ``_row_id`` (e.g. a natural key) — the
    # golden-oracle path depends on reproducible ids; otherwise derive one
    # from a content hash
    if "_row_id" not in wos.columns:
        wos = wos.withColumn(
            "_row_id",
            F.concat(F.lit("w"), F.xxhash64(*[F.col(c) for c in wos.columns]).cast("string")),
        )
    if "_row_id" not in scp.columns:
        scp = scp.withColumn(
            "_row_id",
            F.concat(F.lit("s"), F.xxhash64(*[F.col(c) for c in scp.columns]).cast("string")),
        )
    wos = with_norm_columns(wos)
    scp = with_norm_columns(scp)
    shared_fields = sorted(
        (set(wos.columns) & set(scp.columns))
        - {c for c in wos.columns if c.startswith("_")}
    )
    pairs = candidate_pairs(wos, scp)
    scored = score_pairs(pairs).persist()
    if assignment == "greedy":
        assigned = assign_one_to_one_greedy(scored).persist()
    elif assignment == "symmetric":
        assigned = assign_one_to_one(scored).persist()
    else:
        raise ValueError(f"unknown assignment mode: {assignment!r}")

    merged = merge_matched(assigned, shared_fields)
    matched_w = assigned.select(F.col("w_id").alias("_row_id"))
    matched_s = assigned.select(F.col("s_id").alias("_row_id"))
    lost_wos = wos.join(matched_w, "_row_id", "left_anti")
    lost_scp = scp.join(matched_s, "_row_id", "left_anti")

    borderline = scored.filter(F.col("is_borderline")).select(
        "w_id", "s_id", "confidence", "_title_jw",
        *[c for c in ("wTI", "sTI", "wDI", "sDI") if c in scored.columns],
    )
    if assignment == "greedy":
        # reference loop order: every definite confidence (>= 0.90) outranks
        # every borderline one (<= 0.85), so a borderline pair enqueues iff
        # neither endpoint was consumed by a definite match
        borderline = borderline.join(matched_w.withColumnRenamed("_row_id", "w_id"),
                                     "w_id", "left_anti")
        borderline = borderline.join(matched_s.withColumnRenamed("_row_id", "s_id"),
                                     "s_id", "left_anti")
    conflict_log = merged.select(
        "w_id", "s_id", F.explode("_conflicts").alias("c")
    ).select("w_id", "s_id", "c.field", "c.wos_value", "c.scopus_value")
    match_audit = assigned.select("w_id", "s_id", "stage", "confidence")

    return {
        "merged": merged.drop("_conflicts"),
        "lost_wos": lost_wos,
        "lost_scopus": lost_scp,
        "borderline": borderline,
        "conflict_log": conflict_log,
        "match_audit": match_audit,
    }


def _doi_conflict_expr(w_raw, s_raw):
    """Both raw DOIs normalize to values AND they differ (doi_conflict,
    smart_merger.py:230-240) — the retroactive safety layer for old queues."""
    w, s = bn.normalize_doi(w_raw), bn.normalize_doi(s_raw)
    return w.isNotNull() & s.isNotNull() & (w != s)


def decide_borderline(
    dataset: DataFrame,
    borderline: DataFrame,
    decisions: DataFrame,
    table=None,
) -> dict[str, DataFrame]:
    """Apply user borderline decisions (decide_borderline,
    smart_merger.py:887-989).

    ``dataset``    the assembled post-merge table (merged ∪ lost rows) with
                   a DI column — accept means "same publication", so the
                   redundant Scopus row is dropped by its DOI.
    ``borderline`` the queue from run_smart_merge (w_id, s_id, wDI, sDI...).
    ``decisions``  (w_id, s_id, decision in 'accept'|'reject'|'skip').

    DOI guard runs again at apply time (reference rule: the guard is
    authoritative in the apply layer too — a direct API call can never force
    a wrong merge).  Returns the new dataset, the per-decision audit rows,
    and the accepted-and-applied pairs.  When ``table`` (a VersionedTable)
    is given, the new dataset is written as a fresh snapshot — the prior
    version IS the pre-mutation snapshot (append-only discipline).
    """
    joined = decisions.join(borderline, ["w_id", "s_id"], "inner")
    guard = (
        _doi_conflict_expr(F.col("wDI"), F.col("sDI"))
        if "wDI" in joined.columns and "sDI" in joined.columns
        else F.lit(False)
    )
    judged = joined.withColumn("doi_guarded", guard).withColumn(
        "effective",
        F.when(F.col("doi_guarded"), F.lit("blocked")).otherwise(F.col("decision")),
    )
    accepted = judged.filter(F.col("effective") == "accept")

    if "_row_id" in dataset.columns:
        # exact row identity: drop the accepted Scopus ROW (never collateral
        # — a merged row that inherited the same DOI survives).  Improvement
        # over the reference's DOI-keyed drop, which both no-ops on
        # DOI-less Scopus rows and can delete a merged row sharing the DOI.
        drop_keys = accepted.select(F.col("s_id").alias("_drop_key")).distinct()
        new_dataset = dataset.join(
            F.broadcast(drop_keys),
            dataset["_row_id"] == drop_keys["_drop_key"],
            "left_anti",
        )
        applied_expr = F.lit(True)
    else:
        # reference-parity fallback (smart_merger.py:952-963): drop by the
        # Scopus DOI; DOI-less accepts cannot be applied and are audited as
        # 'accept_noop', never silently claimed as applied.
        drop_keys = (
            accepted.select(F.lower(F.trim(F.col("sDI"))).alias("_drop_di"))
            .filter(F.col("_drop_di").isNotNull() & (F.col("_drop_di") != ""))
            .distinct()
        )
        new_dataset = dataset.join(
            F.broadcast(drop_keys),
            F.lower(F.trim(dataset["DI"])) == drop_keys["_drop_di"],
            "left_anti",
        )
        applied_expr = (
            F.col("sDI").isNotNull() & (F.trim(F.col("sDI")) != "")
            if "sDI" in judged.columns
            else F.lit(False)
        )
    audit = judged.withColumn(
        "effective",
        F.when(
            (F.col("effective") == "accept") & ~applied_expr,
            F.lit("accept_noop"),
        ).otherwise(F.col("effective")),
    ).select("w_id", "s_id", "decision", "doi_guarded", "effective")
    if table is not None:
        table.write(new_dataset)
    return {"dataset": new_dataset, "audit": audit, "accepted": accepted}
