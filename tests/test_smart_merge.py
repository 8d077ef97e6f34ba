"""Smart Merge tests, mirroring the reference's golden rule-level suite
(apps/api/tests/test_smart_merge.py:35-135): the DOI negative rule, stage
assignment, field-preference merging, lost records, borderline band."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bibexpy_spark.operators import smart_merge as sm


def _wos_rows():
    return [
        # w0/s0: same DOI -> Stage 1
        {"AU": "Smith, J.", "TI": "Deep learning for dedup", "SO": "J DATA",
         "PY": "2020", "DI": "10.1/a", "SN": "1111-2222", "VL": "5", "BP": "10",
         "TC": "3", "AB": "Short abstract.", "DE": "dedup; ml"},
        # w1/s1: no ids, near title + same year + same surname -> Stage 3
        {"AU": "Jones, K.", "TI": "Clustering of transcripts at scale",
         "SO": "J PROC", "PY": "2021", "DI": "", "SN": "", "VL": "7", "BP": "1",
         "TC": "1", "AB": "", "DE": "clusters"},
        # w2/s2: DIFFERENT DOIs, identical otherwise -> negative rule
        {"AU": "Brown, A.", "TI": "An identical title here", "SO": "J X",
         "PY": "2019", "DI": "10.1/x1", "SN": "", "VL": "1", "BP": "2",
         "TC": "0", "AB": "", "DE": ""},
        # w3: unmatched
        {"AU": "Solo, W.", "TI": "Only in web of science", "SO": "J W",
         "PY": "2018", "DI": "10.9/solo", "SN": "", "VL": "2", "BP": "3",
         "TC": "9", "AB": "", "DE": ""},
        # w4/s4: borderline title (same year/surname, JW in [0.80, 0.92))
        {"AU": "Gray, B.", "TI": "Measuring shuffle skew in engines",
         "SO": "J Y", "PY": "2022", "DI": "", "SN": "", "VL": "3", "BP": "4",
         "TC": "2", "AB": "", "DE": ""},
    ]


def _scp_rows():
    return [
        {"AU": "Smith, John", "TI": "DEEP LEARNING FOR DEDUP (extended)",
         "SO": "Journal of Data", "PY": "2020", "DI": "https://doi.org/10.1/A",
         "SN": "11112222", "VL": "5", "BP": "10", "TC": "7",
         "AB": "A much longer abstract with details.", "DE": "ml; spark"},
        {"AU": "Jones, Kim", "TI": "Clustering of transcripts at scales",
         "SO": "Journal of Processing", "PY": "2021", "DI": "", "SN": "",
         "VL": "7", "BP": "1", "TC": "2", "AB": "", "DE": "clusters; lsh"},
        {"AU": "Brown, Alice", "TI": "An identical title here", "SO": "J X",
         "PY": "2019", "DI": "10.1/x2", "SN": "", "VL": "1", "BP": "2",
         "TC": "1", "AB": "", "DE": ""},
        {"AU": "Lone, S.", "TI": "Only in scopus database", "SO": "J S",
         "PY": "2017", "DI": "10.8/lone", "SN": "", "VL": "9", "BP": "9",
         "TC": "4", "AB": "", "DE": ""},
        {"AU": "Gray, Bob", "TI": "Measured shuffling skews with big engines",
         "SO": "J Y", "PY": "2022", "DI": "", "SN": "", "VL": "99", "BP": "4",
         "TC": "0", "AB": "", "DE": ""},
    ]


@pytest.fixture(scope="module")
def result(spark):
    wos = spark.createDataFrame(_wos_rows())
    scp = spark.createDataFrame(_scp_rows())
    res = sm.run_smart_merge(wos, scp)
    return {k: v.toPandas() for k, v in res.items()}


def test_stage1_doi_exact(result):
    audit = result["match_audit"]
    m = result["merged"]
    s1 = m[m.stage == 1]
    assert len(s1) == 1
    assert s1.iloc[0]["TI"] == "Deep learning for dedup"  # wos-preferred
    assert s1.iloc[0]["confidence"] == 1.0


def test_stage3_title_year_surname(result):
    s3 = result["merged"][result["merged"].stage == 3]
    assert len(s3) == 1
    assert s3.iloc[0]["TI"].startswith("Clustering of transcripts")


def test_negative_rule_blocks_match_and_borderline(result):
    """Differing DOIs: never matched, never borderline (reference
    test_smart_merge.py:52-57,70-77)."""
    m, b = result["merged"], result["borderline"]
    assert not any(m["TI"] == "An identical title here")
    if len(b):
        assert not any(b.get("wTI", "") == "An identical title here")
    lw = result["lost_wos"]
    assert any(lw["TI"] == "An identical title here")


def test_borderline_band(result):
    b = result["borderline"]
    assert len(b) == 1
    assert b.iloc[0]["wTI"].startswith("Measuring shuffle")
    assert 0.70 <= b.iloc[0]["confidence"] < 0.85


def test_lost_records_pass_through(result):
    assert any(result["lost_wos"]["TI"] == "Only in web of science")
    assert any(result["lost_scopus"]["TI"] == "Only in scopus database")


def test_field_preferences(result):
    """Exact Caputo-2024 table parity (reference smart_merger.py:40-57):
    TC from WoS, AB/AU from Scopus, DE union-dedup."""
    s1 = result["merged"][result["merged"].stage == 1].iloc[0]
    assert s1["TC"] == "3"                       # wos-preferred
    assert "longer abstract" in s1["AB"]         # scopus-preferred
    assert s1["AU"] == "Smith, John"             # scopus-preferred
    assert set(s1["DE"].split("; ")) == {"dedup", "ml", "spark"}  # union


def test_conflict_log(result):
    cl = result["conflict_log"]
    assert len(cl) > 0
    tc_conflicts = cl[cl.field == "TC"]
    assert len(tc_conflicts) >= 1
    row = tc_conflicts.iloc[0]
    assert row["wos_value"] != row["scopus_value"]


def test_empty_titles_never_fuzzy_match(spark):
    """compute_match gates stages 3-5 on BOTH titles nonempty
    (smart_merger.py:282): two records missing TI (and AU) with close years
    must NOT auto-match — jaro_winkler('','')==1.0 would otherwise fire
    stage 3 at confidence 0.95 (ADVICE round 1, high)."""
    wos = spark.createDataFrame(
        [{"AU": "", "TI": "", "SO": "J A", "PY": "2020", "DI": ""}]
    )
    scp = spark.createDataFrame(
        [{"AU": "", "TI": "", "SO": "J A", "PY": "2020", "DI": ""}]
    )
    res = sm.run_smart_merge(wos, scp)
    assert res["merged"].count() == 0
    assert res["borderline"].count() == 0


def test_pmid_issn_negative_rules(spark):
    """negative_rule_check covers PMID and ISSN, not just DOI
    (smart_merger.py:205-227)."""
    base = {"AU": "Same, A.", "TI": "The exact same title", "SO": "J A",
            "PY": "2020", "DI": ""}
    wos = spark.createDataFrame([{**base, "PM": "111", "SN": "1111-2222"}])
    scp = spark.createDataFrame([{**base, "PM": "222", "SN": "1111-2222"}])
    res = sm.run_smart_merge(wos, scp)
    assert res["merged"].count() == 0  # PMID mismatch rejects

    scp2 = spark.createDataFrame([{**base, "PM": "111", "SN": "3333-4444"}])
    res2 = sm.run_smart_merge(wos, scp2)
    assert res2["merged"].count() == 0  # ISSN mismatch rejects

    scp3 = spark.createDataFrame([{**base, "PM": "111", "SN": "1111-2222"}])
    res3 = sm.run_smart_merge(wos, scp3)
    audit = res3["match_audit"].toPandas()
    assert len(audit) == 1 and audit.iloc[0]["stage"] == 2
    assert audit.iloc[0]["confidence"] == 0.99  # reference stage-2 confidence


def test_borderline_predicate_title_only(spark):
    """Stage 5 queues on title JW alone (smart_merger.py:336-348) — no
    year/surname condition beyond the block key; confidence is the linear
    band value rounded to 3 decimals (reference `round(conf, 3)`)."""
    wos = spark.createDataFrame(
        [{"AU": "Gray, B.", "TI": "Measuring shuffle skew in engines",
          "SO": "J Y", "PY": "2019", "DI": ""}]
    )
    scp = spark.createDataFrame(
        [{"AU": "Gold, X.", "TI": "Measured shuffling skews with big engines",
          "SO": "J Z", "PY": "2019", "DI": ""}]
    )
    res = sm.run_smart_merge(wos, scp)
    b = res["borderline"].toPandas()
    assert len(b) == 1  # different surnames, same initial block — still queued
    assert round(b.iloc[0]["confidence"], 3) == b.iloc[0]["confidence"]


def test_counts_add_up(result):
    n_w, n_s = 5, 5
    n_m = len(result["merged"])
    assert len(result["lost_wos"]) == n_w - n_m
    assert len(result["lost_scopus"]) == n_s - n_m


# -- exact-greedy parity mode (reference smart_merger.py:654-711) -------------

def _contested_block(spark):
    """A contested A-B-C chain inside one (year, initial) block:

      (w1, s2)  stage 2 PMID exact, conf 0.99
      (w1, s1)  stage 3 title JW,   conf 0.95
      (w2, s1)  stage 3 title JW,   conf 0.95

    Reference greedy (confidence order): w1 takes s2, then s1 falls to w2 ->
    TWO matches.  Symmetric best match: s1's best is w1 (tie-break w_id asc),
    which is taken by s2 -> the (w2, s1) pair is asymmetric and drops -> ONE
    match.  This is the documented divergence the parity mode closes.
    """
    wos = spark.createDataFrame(
        [
            {"_row_id": "w1", "AU": "Alpha, Anne",
             "TI": "Transcript deduplication with minhash signatures at scale",
             "PY": "2021", "DI": "", "PM": "100"},
            {"_row_id": "w2", "AU": "Alpha, Carl",
             "TI": "Transcript deduplication with minhash signature at scales",
             "PY": "2021", "DI": "", "PM": ""},
        ]
    )
    scp = spark.createDataFrame(
        [
            {"_row_id": "s1", "AU": "Alpha, Bob",
             "TI": "Transcript deduplication with minhash signatures at scales",
             "PY": "2021", "DI": "", "PM": ""},
            {"_row_id": "s2", "AU": "Alpha, Dana",
             "TI": "An entirely unrelated subject matter on other things",
             "PY": "2021", "DI": "", "PM": "100"},
        ]
    )
    return wos, scp


def test_greedy_parity_contested_block(spark):
    wos, scp = _contested_block(spark)

    sym = sm.run_smart_merge(wos, scp, assignment="symmetric")
    sym_pairs = {
        (r["w_id"], r["s_id"]) for r in sym["match_audit"].collect()
    }
    assert sym_pairs == {("w1", "s2")}  # asymmetric (w2, s1) drops

    grd = sm.run_smart_merge(wos, scp, assignment="greedy")
    audit = {(r["w_id"], r["s_id"]): r for r in grd["match_audit"].collect()}
    # hand-computed reference greedy expectation
    assert set(audit) == {("w1", "s2"), ("w2", "s1")}
    assert audit[("w1", "s2")]["stage"] == 2
    assert audit[("w1", "s2")]["confidence"] == 0.99
    assert audit[("w2", "s1")]["stage"] == 3
    assert audit[("w2", "s1")]["confidence"] == 0.95
    # lost records shrink accordingly
    assert grd["lost_wos"].count() == 0
    assert grd["lost_scopus"].count() == 0


def test_greedy_borderline_queue_excludes_consumed(spark):
    """Reference loop: a borderline pair whose endpoint was consumed by a
    definite match never enqueues (definite conf >= 0.90 > borderline)."""
    wos = spark.createDataFrame(
        [{"_row_id": "w1", "AU": "Alpha, Anne",
          "TI": "Transcript deduplication with minhash signatures at scale",
          "PY": "2021", "DI": "10.1/same", "PM": ""}]
    )
    scp = spark.createDataFrame(
        [
            # stage-1 DOI match consumes w1
            {"_row_id": "s1", "AU": "Alpha, Bob",
             "TI": "Transcript deduplication with minhash signatures at scales",
             "PY": "2021", "DI": "10.1/same", "PM": ""},
            # borderline-band title vs w1 (no ids)
            {"_row_id": "s2", "AU": "Alpha, Dana",
             "TI": "Transcripts deduplicating with hashing signature scale",
             "PY": "2021", "DI": "", "PM": ""},
        ]
    )
    grd = sm.run_smart_merge(wos, scp, assignment="greedy")
    assert grd["match_audit"].count() == 1
    assert grd["borderline"].count() == 0  # w1 consumed -> queue empty
    sym = sm.run_smart_merge(wos, scp, assignment="symmetric")
    # default mode keeps the full queue (existing behavior, documented)
    assert sym["borderline"].count() >= grd["borderline"].count()
