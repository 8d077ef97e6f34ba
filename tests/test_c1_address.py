"""C1 address parsing tests (reference c1_utils.py micro-fixtures)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bibexpy_spark.functions import c1_address as c1


def test_split_c1_bracket_aware():
    cell = "[Smith, J.; Doe, A.] Univ One, Dept X, City, USA; [Lee, B.] Univ Two, Turkiye"
    parts = c1.split_c1(cell)
    assert len(parts) == 2
    assert parts[0].startswith("[Smith, J.; Doe, A.]")


def test_parse_address_country_canonical():
    a = c1.parse_address("[Smith, J.] Univ One, Dept X, City, Peoples R China")
    assert a["authors"] == "Smith, J."
    assert a["institution"] == "Univ One"
    assert a["country"] == "CHINA"
    b = c1.parse_address("Univ Free, Berlin, Germany.")
    assert b["authors"] == ""
    assert b["country"] == "GERMANY"


def test_canonical_country_variants():
    assert c1.canonical_country(" u.s.a.") == "UNITED STATES"
    assert c1.canonical_country("England") == "UNITED KINGDOM"
    assert c1.canonical_country("Narnia") == "NARNIA"


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        ("r1", "[Smith, J.] Univ One, City, USA; [Doe, A.] Univ Two, Oxford, England"),
        ("r2", "Univ Three, Ankara, Turkiye"),
        ("r3", None),
    ]
    return spark.createDataFrame(rows, ["UID", "C1"])


def test_explode_addresses(df):
    out = c1.explode_addresses(df, "UID").toPandas()
    assert len(out) == 3  # r1 has 2 addresses, r2 has 1, r3 none
    assert set(out.country) == {"UNITED STATES", "UNITED KINGDOM", "TURKEY"}


def test_country_counts(df):
    out = {r["country"]: r["n_records"] for r in c1.country_counts(df, "UID").collect()}
    assert out == {"UNITED STATES": 1, "UNITED KINGDOM": 1, "TURKEY": 1}


def test_replace_country_preserves_prefix(df, spark):
    udf = c1.make_replace_country_udf({"UNITED STATES": "United States of America"})
    out = df.filter(F.col("C1").isNotNull()).withColumn(
        "C1b", udf(F.col("C1"))
    ).toPandas()
    r1 = out[out.UID == "r1"].iloc[0]["C1b"]
    assert r1.startswith("[Smith, J.] ")
    assert "United States of America" in r1
    assert "England" in r1  # unmapped country untouched
