"""Filter-spec compiler tests (parity with reference filter_engine.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bibexpy_spark.operators import filter_spec


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "2020", "ARTICLE", "Deep learning for cats", "10"),
        (2, "2021", "review", "Shallow models for dogs", ""),
        (3, "2019", "Article", "Deep learning for dogs AND cats", "NAN"),
        (4, "1800", "Letter", "Unrelated topic entirely", "3"),
        (5, None, "ARTICLE", None, None),
    ]
    return spark.createDataFrame(rows, ["UID", "PY", "DT", "TI", "TC"])


def test_range_filter(df):
    out = filter_spec.apply_filter(df, {"ranges": {"PY": (2019, 2021)}})
    assert {r["UID"] for r in out.collect()} == {1, 2, 3}


def test_in_filter_case_insensitive(df):
    out = filter_spec.apply_filter(df, {"in": {"DT": ["article"]}})
    assert {r["UID"] for r in out.collect()} == {1, 3, 5}


def test_contains_any(df):
    out = filter_spec.apply_filter(df, {"contains": {"TI": ["deep", "letter"]}})
    assert {r["UID"] for r in out.collect()} == {1, 3}


def test_fulltext_and_or_not(df):
    out = filter_spec.apply_filter(
        df, {"fulltext": "deep AND cats"}, fulltext_cols=["TI"]
    )
    assert {r["UID"] for r in out.collect()} == {1, 3}
    out = filter_spec.apply_filter(
        df, {"fulltext": "deep AND NOT dogs"}, fulltext_cols=["TI"]
    )
    assert {r["UID"] for r in out.collect()} == {1}
    out = filter_spec.apply_filter(
        df, {"fulltext": '"for dogs" OR letter'}, fulltext_cols=["TI"]
    )
    assert {r["UID"] for r in out.collect()} == {2, 3}


def test_fulltext_parentheses(df):
    out = filter_spec.apply_filter(
        df, {"fulltext": "deep AND (dogs OR cats)"}, fulltext_cols=["TI"]
    )
    assert {r["UID"] for r in out.collect()} == {1, 3}


def test_quality_missing_present(df):
    out = filter_spec.apply_filter(df, {"quality": {"TC": "missing"}})
    assert {r["UID"] for r in out.collect()} == {2, 3, 5}
    out = filter_spec.apply_filter(df, {"quality": {"TC": "present"}})
    assert {r["UID"] for r in out.collect()} == {1, 4}


def test_conjunctive_composition(df):
    spec = {
        "ranges": {"PY": (2019, 2021)},
        "in": {"DT": ["article"]},
        "quality": {"TC": "present"},
    }
    out = filter_spec.apply_filter(df, spec)
    assert {r["UID"] for r in out.collect()} == {1}


def test_facets(df):
    facets = filter_spec.compute_facets(df, ["DT"], top_n=2)
    vals = [(r["value"], r["count"]) for r in facets["DT"]]
    assert vals[0][0] == "ARTICLE" and vals[0][1] == 2


def test_paginate(df):
    page = filter_spec.paginate(df, "UID", offset=1, limit=2, cols=["UID"])
    assert [r["UID"] for r in page.collect()] == [2, 3]


def test_pushdown_reaches_scan(spark, tmp_path):
    """Range predicates must push into the parquet scan (PushedFilters)."""
    p = str(tmp_path / "t.parquet")
    spark.range(100).withColumn("v", F.col("id") * 2).write.parquet(p)
    df = spark.read.parquet(p)
    out = filter_spec.apply_filter(df, {"ranges": {"id": (10, 20)}})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "IsNotNull(id)" in plan or "GreaterThan" in plan


def test_paginate_skips_unorderable_tiebreak_columns(spark):
    """paginate tiebreaks on every ORDERABLE column; a map-typed column
    must be skipped, not raise AnalysisException (r4 review)."""
    rows = [(2, {"k": "b"}, "y"), (1, {"k": "a"}, "x"), (3, {"k": "c"}, "z")]
    df = spark.createDataFrame(rows, "UID int, meta map<string,string>, tag string")
    page = filter_spec.paginate(df, "UID", offset=0, limit=2)
    assert [r["UID"] for r in page.collect()] == [1, 2]
    assert set(page.columns) == {"UID", "meta", "tag"}


def test_paginate_tiebreak_deterministic_across_pages(spark):
    """Rows tied on order_col must partition cleanly across pages (no row
    on two pages, none lost) because the other orderable columns break
    the tie identically in every per-page job."""
    rows = [(1, f"t{i:02d}") for i in range(10)]
    df = spark.createDataFrame(rows, "UID int, tag string")
    got = []
    for off in range(0, 10, 3):
        got += [r["tag"] for r in
                filter_spec.paginate(df, "UID", offset=off, limit=3).collect()]
    assert got == [f"t{i:02d}" for i in range(10)]


def test_paginate_skips_variant_tiebreak_column(spark):
    """VariantType (Spark 4) defines no SortOrder either — paginate must
    skip it like maps instead of raising INVALID_ORDERING_TYPE (r4 review:
    the old _orderable only special-cased MapType)."""
    if not hasattr(F, "parse_json"):
        import pytest
        pytest.skip("no VariantType on this Spark")
    df = (
        spark.createDataFrame([(2, "y"), (1, "x"), (3, "z")], "UID int, tag string")
        .withColumn("v", F.parse_json(F.lit('{"k": 1}')))
    )
    page = filter_spec.paginate(df, "UID", offset=0, limit=2)
    assert [r["UID"] for r in page.collect()] == [1, 2]
    assert set(page.columns) == {"UID", "tag", "v"}
