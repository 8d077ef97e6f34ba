"""C1 address parsing tests — reference-exact micro-fixtures mirroring
c1_utils.py behavior (bracket split :191-222, parse :225-257, country canon
:95-104, org keywords :156-185, rollup :268-283, rewrite :286-330)."""

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
    assert a["country"] == "China"
    b = c1.parse_address("Univ Free, Berlin, Germany.")
    assert b["authors"] == ""
    assert b["country"] == "Germany"


def test_parse_address_org_keyword_scan():
    """Institution = rightmost org-keyword part that is not a sub-unit
    (c1_utils.py:246-253); geographic tails stripped first."""
    a = c1.parse_address("Dept Biol, Harvard Univ, Cambridge, MA 02138, USA")
    assert a["institution"] == "Harvard Univ"  # not the Dept, not the city
    assert a["country"] == "United States"
    # subunit preferred only when no non-subunit org part exists
    b = c1.parse_address("School of Medicine, Springfield, USA")
    assert b["institution"] == "School of Medicine"


def test_parse_address_never_guesses():
    """No org keyword anywhere -> institution None (reference rule 3:
    'TAHMIN ETME' — do not pick a city)."""
    a = c1.parse_address("Research Triangle Park, NC 27709, USA")
    assert a["institution"] is None
    assert a["country"] == "United States"
    b = c1.parse_address("Acme Gmbh, Munich, Germany")
    assert b["institution"] is None


def test_canonical_country_variants():
    assert c1.canonical_country(" u.s.a.") == "United States"
    assert c1.canonical_country("England") == "United Kingdom"
    assert c1.canonical_country("FRANCE") == "France"   # already canonical
    assert c1.canonical_country("Narnia") is None       # never guessed


def test_rollup_c1():
    cell = ("[A, B] Dept Phys, MIT Inst, Cambridge, MA 02139, USA; "
            "[C, D] Somewhere Unparseable, Nowhere")
    rolled = c1.rollup_c1(cell)
    assert rolled.startswith("MIT Inst, United States")
    assert "Somewhere Unparseable, Nowhere" in rolled  # unparsed stays raw


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
    assert set(out.country) == {"United States", "United Kingdom", "Turkey"}


def test_country_counts(df):
    out = {r["country"]: r["n_records"] for r in c1.country_counts(df, "UID").collect()}
    assert out == {"United States": 1, "United Kingdom": 1, "Turkey": 1}


def test_replace_country_preserves_prefix(df, spark):
    udf = c1.make_replace_country_udf({"United States": "United States of America"})
    out = df.filter(F.col("C1").isNotNull()).withColumn(
        "C1b", udf(F.col("C1"))
    ).toPandas()
    r1 = out[out.UID == "r1"].iloc[0]["C1b"]
    assert r1.startswith("[Smith, J.] ")
    assert "United States of America" in r1
    assert "England" in r1  # replace maps canonical keys; England untouched
