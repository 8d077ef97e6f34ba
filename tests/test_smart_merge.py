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
    s1 = result["merged"][result["merged"].stage == 1].iloc[0]
    assert s1["TC"] == "7"                       # scopus-preferred
    assert "longer abstract" in s1["AB"]         # longer-wins
    assert set(s1["DE"].split("; ")) == {"dedup", "ml", "spark"}  # union


def test_conflict_log(result):
    cl = result["conflict_log"]
    assert len(cl) > 0
    tc_conflicts = cl[cl.field == "TC"]
    assert len(tc_conflicts) >= 1
    row = tc_conflicts.iloc[0]
    assert row["wos_value"] != row["scopus_value"]


def test_counts_add_up(result):
    n_w, n_s = 5, 5
    n_m = len(result["merged"])
    assert len(result["lost_wos"]) == n_w - n_m
    assert len(result["lost_scopus"]) == n_s - n_m
