"""Entity-standardization proposal builders: affiliation blocks, author
splits (detect + apply), country blocks, org rollup, borderline decide —
reference-semantics fixtures (blocking.py:286-583, pipeline.py:884-975,
smart_merger.py:887-989)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bibexpy_spark.operators import entity_blocks as eb
from bibexpy_spark.operators import smart_merge as sm


# ---------------------------------------------------------------------------
# affiliation blocks
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def affil_df(spark):
    # variants share the block token 'example' (blocking is first-meaningful-
    # token, blocking.py:381-384); pairwise JW in [0.85, 0.95) -> tier 2
    rows = [
        ("r1", "[A, B] Example Univ, Springfield, USA"),
        ("r2", "Example University, Springfield, USA"),
        ("r3", "Example Univ Hosp, Springfield, USA"),
        ("r4", "Acad Sinica Inst, Taipei, Taiwan"),         # distinct block
        ("r5", None),
    ]
    return spark.createDataFrame(rows, ["UID", "C1"])


def test_affiliation_blocks_cluster_variants(affil_df):
    out = eb.affiliation_blocks(affil_df).toPandas()
    assert len(out) == 1  # one multi-variant cluster; singletons skipped
    c = out.iloc[0]
    assert c["tier"] == 2  # min pairwise JW 0.898 < 0.95 -> review
    assert len(c["variants"]) == 3
    assert set(c["records"]) == {"r1", "r2", "r3"}


def test_affiliation_blocks_tier1_near_identical(spark):
    rows = [
        ("r1", "Example Univ, Springfield, USA"),
        ("r2", "Example Univ, Springfeld, USA"),  # JW 0.993 >= 0.95 -> auto
    ]
    df = spark.createDataFrame(rows, ["UID", "C1"])
    out = eb.affiliation_blocks(df).toPandas()
    assert len(out) == 1 and out.iloc[0]["tier"] == 1


# ---------------------------------------------------------------------------
# author splits
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def split_df(spark):
    rows = [
        # "Zipf A" spans two field-disjoint groups: physics (u1,u2) / bio (u3)
        ("u1", "Zipf A; Other B", "Physics, Applied", ""),
        ("u2", "Zipf A", "Physics, Applied; Optics", ""),
        ("u3", "Zipf A", "Biology", ""),
        # "Chain C" has chained fields (a-b share, b-c share) -> ONE group
        ("u4", "Chain C", "X; Y", ""),
        ("u5", "Chain C", "Y; Z", ""),
        ("u6", "Chain C", "Z", ""),
        # already-split name must never re-split (idempotence)
        ("u7", "Zipf A (b)", "Chemistry", ""),
    ]
    return spark.createDataFrame(rows, ["UID", "AU", "WC", "SC"])


def test_author_splits_field_disjoint(split_df):
    out = eb.author_split_proposals(split_df).toPandas()
    zipf = out[out.norm == "zipf a"].sort_values("group_idx")
    assert len(zipf) == 2  # two disjoint groups
    g0, g1 = zipf.iloc[0], zipf.iloc[1]
    assert g0["suffix"] == "" and set(g0["records"]) == {"u1", "u2"}  # largest plain
    assert g1["suffix"] == "(b)" and set(g1["records"]) == {"u3"}
    assert g0["tier"] == 1
    # chained components stay together -> no proposal
    assert not len(out[out.norm == "chain c"])
    # suffixed mentions never re-proposed
    assert not any(out.name.str.contains(r"\(b\)"))


def test_apply_author_splits(split_df, spark):
    splits = eb.author_split_proposals(split_df)
    out = eb.apply_author_splits(split_df, splits, id_col="UID").toPandas()
    by_uid = dict(zip(out["UID"], out["AU"]))
    assert by_uid["u3"] == "Zipf A (b)"              # suffixed group rewritten
    assert by_uid["u1"] == "Zipf A; Other B"          # plain group untouched
    assert by_uid["u4"] == "Chain C"                  # non-split untouched
    # idempotence: applying again changes nothing (suffixed names excluded)
    df2 = spark.createDataFrame(out, ["UID", "AU", "WC", "SC"])
    splits2 = eb.author_split_proposals(df2)
    assert splits2.filter(F.col("norm") == "zipf a").count() == 0


# ---------------------------------------------------------------------------
# country blocks + standardize apply
# ---------------------------------------------------------------------------

def test_country_blocks_tiers(spark):
    rows = [
        ("r1", "Univ A, City, USA"),
        ("r2", "Univ B, City, U.S.A."),
        ("r3", "Univ C, City, United States"),     # already canonical
        ("r4", "Univ D, City, Fantasialand"),      # unknown -> tier 2
        ("r5", "Univ E, City, 90210"),             # digits -> dropped
    ]
    df = spark.createDataFrame(rows, ["UID", "C1"])
    out = eb.country_blocks(df, "UID").toPandas()
    t1 = out[out.tier == 1]
    assert len(t1) == 1
    assert t1.iloc[0]["canonical"] == "United States"
    assert set(t1.iloc[0]["variants"]) == {"USA", "U.S.A.", "United States"}
    t2 = out[out.tier == 2]
    assert list(t2["variants"].map(tuple)) == [("Fantasialand",)]


def test_standardize_countries_apply(spark):
    df = spark.createDataFrame(
        [("r1", "[A, B] Univ X, City, Peoples R China; Univ Y, Town, England")],
        ["UID", "C1"],
    )
    out = df.withColumn("C1", eb.standardize_countries_udf(F.col("C1"))).first()
    assert out["C1"] == "[A, B] Univ X, City, China; Univ Y, Town, United Kingdom"


# ---------------------------------------------------------------------------
# org rollup
# ---------------------------------------------------------------------------

def test_org_rollup_blocks_and_apply(spark):
    rows = [
        ("r1", "Dept Phys, Harvard Univ, Cambridge, MA 02138, USA"),
        ("r2", "Harvard Univ, Boston, USA"),
        ("r3", "Dept Chem, Harvard University, Cambridge, USA"),
        ("r4", "Unparseable Place, Nowhere"),
    ]
    df = spark.createDataFrame(rows, ["UID", "C1"])
    blocks = eb.org_rollup_blocks(df, "UID").toPandas()
    assert len(blocks) == 1
    b = blocks.iloc[0]
    assert b["canonical_name"] == "Harvard Univ"  # most frequent parent
    assert set(b["records"]) == {"r1", "r2", "r3"}
    rolled = eb.apply_org_rollup(df).toPandas().set_index("UID")["C1"]
    assert rolled["r1"] == "Harvard Univ, United States"
    assert rolled["r4"] == "Unparseable Place, Nowhere"  # raw passthrough


# ---------------------------------------------------------------------------
# borderline decide
# ---------------------------------------------------------------------------

def test_decide_borderline_roundtrip(spark, tmp_path):
    from bibexpy_spark.operators.records import VersionedTable

    wos = spark.createDataFrame(
        [{"AU": "Gray, B.", "TI": "Measuring shuffle skew in engines",
          "SO": "J Y", "PY": "2022", "DI": "", "TC": "1"}]
    )
    scp = spark.createDataFrame(
        [{"AU": "Gray, Bob", "TI": "Measured shuffling skews with big engines",
          "SO": "J Y", "PY": "2022", "DI": "10.5/scp.gray", "TC": "2"}]
    )
    res = sm.run_smart_merge(wos, scp)
    b = res["borderline"]
    assert b.count() == 1
    # assembled dataset: merged (none) + lost rows from both sides
    shared = ["AU", "TI", "SO", "PY", "DI", "TC"]
    dataset = res["lost_wos"].select(*shared).unionByName(
        res["lost_scopus"].select(*shared)
    )
    assert dataset.count() == 2

    pair = b.select("w_id", "s_id").first()
    decisions = spark.createDataFrame(
        [(pair["w_id"], pair["s_id"], "accept")], ["w_id", "s_id", "decision"]
    )
    table = VersionedTable(spark, str(tmp_path / "ds"))
    table.write(dataset)
    out = sm.decide_borderline(dataset, b, decisions, table=table)
    new = out["dataset"].toPandas()
    assert len(new) == 1                      # the Scopus row dropped
    assert new.iloc[0]["TI"].startswith("Measuring")
    assert table.current_version() == 2       # pre-mutation snapshot retained
    assert table.read(1).count() == 2
    audit = out["audit"].toPandas()
    assert audit.iloc[0]["effective"] == "accept"


def test_decide_borderline_doi_guard(spark):
    """A queued pair whose DOIs conflict can never be applied — even by a
    direct accept decision (reference apply-layer guard)."""
    import pandas as pd

    borderline = spark.createDataFrame(
        pd.DataFrame(
            [{"w_id": "w1", "s_id": "s1", "confidence": 0.8, "_title_jw": 0.85,
              "wTI": "t", "sTI": "t2", "wDI": "10.1/a", "sDI": "10.1/b"}]
        )
    )
    dataset = spark.createDataFrame(
        [("keepme", "10.1/b")], ["TI", "DI"]
    )
    decisions = spark.createDataFrame(
        [("w1", "s1", "accept")], ["w_id", "s_id", "decision"]
    )
    out = sm.decide_borderline(dataset, borderline, decisions)
    assert out["dataset"].count() == 1        # nothing dropped
    audit = out["audit"].first()
    assert audit["doi_guarded"] and audit["effective"] == "blocked"


def test_apply_splits_covers_all_spellings(spark):
    """Norm-matched rewrite (code-review r2 finding): a record whose token is
    spelled differently ('Smith, J' vs 'Smith J') must still get its suffix,
    with its ORIGINAL spelling preserved."""
    rows = [
        ("u1", "Smith J", "Physics", ""),
        ("u2", "Smith, J", "Physics", ""),
        ("u3", "Smith J.", "Biology", ""),
    ]
    df = spark.createDataFrame(rows, ["UID", "AU", "WC", "SC"])
    splits = eb.author_split_proposals(df)
    zipf = splits.toPandas()
    assert len(zipf) == 2  # one 2-group split on norm 'smith j'
    out = eb.apply_author_splits(df, splits, id_col="UID").toPandas()
    by_uid = dict(zip(out["UID"], out["AU"]))
    # biology singleton gets the suffix regardless of which group is largest
    suffixed = [v for v in by_uid.values() if "(b)" in v]
    assert len(suffixed) == 1
    assert by_uid["u3"] == "Smith J. (b)"  # original spelling kept


def test_decide_borderline_row_identity_drop(spark):
    """With _row_id in the dataset, accept drops the exact Scopus ROW — a
    DOI-less Scopus row still applies, and a merged row sharing the DOI is
    never collateral (code-review r2 finding)."""
    import pandas as pd

    borderline = spark.createDataFrame(
        pd.DataFrame(
            [{"w_id": "w1", "s_id": "s1", "confidence": 0.8, "_title_jw": 0.85,
              "wTI": "a", "sTI": "b", "wDI": "", "sDI": ""}]
        )
    )
    dataset = spark.createDataFrame(
        [("w1", "keep wos", ""), ("s1", "drop scopus", ""),
         ("m1", "merged row", "10.1/shared")],
        ["_row_id", "TI", "DI"],
    )
    decisions = spark.createDataFrame(
        [("w1", "s1", "accept")], ["w_id", "s_id", "decision"]
    )
    out = sm.decide_borderline(dataset, borderline, decisions)
    left = {r["_row_id"] for r in out["dataset"].collect()}
    assert left == {"w1", "m1"}  # exactly the Scopus row dropped
    assert out["audit"].first()["effective"] == "accept"


def test_decide_borderline_doiless_noop_audited(spark):
    """DOI-keyed fallback (no _row_id): a DOI-less accept cannot apply and
    must be audited as accept_noop, never silently claimed."""
    import pandas as pd

    borderline = spark.createDataFrame(
        pd.DataFrame(
            [{"w_id": "w1", "s_id": "s1", "confidence": 0.8, "_title_jw": 0.85,
              "wTI": "a", "sTI": "b", "wDI": "", "sDI": ""}]
        )
    )
    dataset = spark.createDataFrame([("x", "10.9/z")], ["TI", "DI"])
    decisions = spark.createDataFrame(
        [("w1", "s1", "accept")], ["w_id", "s_id", "decision"]
    )
    out = sm.decide_borderline(dataset, borderline, decisions)
    assert out["dataset"].count() == 1
    assert out["audit"].first()["effective"] == "accept_noop"
