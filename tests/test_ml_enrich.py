"""Train-then-apply enrichment test (parity with ml_utils.py semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bibexpy_spark.training import ml_enrich


@pytest.fixture(scope="module")
def docs(spark):
    """Two clearly-separable vocabularies; some rows unlabeled."""
    animal = "cat dog horse lion tiger wolf bear fox deer rabbit"
    tech = "spark shuffle partition executor catalyst arrow parquet codegen"
    rows = []
    for i in range(30):
        words = (animal if i % 2 == 0 else tech).split()
        text = " ".join(words[(i // 2) % 5:] + words[: (i // 2) % 5])
        label = None if i >= 24 else ("animal" if i % 2 == 0 else "tech")
        rows.append((i, text, label))
    return spark.createDataFrame(rows, ["doc_id", "text", "label"])


@pytest.fixture(scope="module")
def multilabel_docs(spark):
    """Rows legitimately carrying TWO labels (';'-separated, the reference's
    SC/DE shape); vocabulary is separable per label."""
    animal = "cat dog horse lion tiger wolf bear fox deer rabbit"
    tech = "spark shuffle partition executor catalyst arrow parquet codegen"
    rows = []
    for i in range(36):
        rot = (i // 3) % 5
        a = " ".join(animal.split()[rot:] + animal.split()[:rot])
        t = " ".join(tech.split()[rot:] + tech.split()[:rot])
        kind = i % 3  # 0: animal only, 1: tech only, 2: BOTH
        text = a if kind == 0 else (t if kind == 1 else a + " " + t)
        label = ["animal", "tech", "animal; tech"][kind]
        if i >= 30:
            label = None  # the fill targets, two of each kind
        rows.append((i, text, label))
    return spark.createDataFrame(rows, ["doc_id", "text", "labels"])


def test_multilabel_survives_observation_poisoned_session(spark, multilabel_docs):
    """Regression (r4): Spark ML training summaries hold the SparkSession,
    and once anything initializes the session's lazy non-serializable
    ObservationManager — the CC loop's convergence Observation does — any
    summary-carrying model closure fails task serialization
    (NotSerializableException: ObservationManager).  ml_enrich strips
    summaries after fit, so enrichment must work in a session that has
    already observed (the real pipeline order: cluster, then enrich)."""
    from pyspark.sql import Observation

    spark.range(5).observe(
        Observation("poison_obsmanager"), F.count(F.lit(1)).alias("n")
    ).localCheckpoint(eager=True)
    filled, vocab = ml_enrich.fill_missing_multilabel(
        multilabel_docs, labels_col="labels"
    )
    assert vocab == ["animal", "tech"]
    assert filled.count() == 36


def test_fill_missing_multilabel(multilabel_docs):
    """Reference multilabel parity (VERDICT r3 ask #6): a record whose text
    carries both vocabularies must be filled with BOTH labels, '; '-joined
    exactly like predict_subjects (ml_utils.py:166-186)."""
    filled, vocab = ml_enrich.fill_missing_multilabel(
        multilabel_docs, labels_col="labels"
    )
    assert vocab == ["animal", "tech"]
    out = {r["doc_id"]: (r["label_out"], r["label_source"]) for r in filled.collect()}
    assert len(out) == 36
    predicted = {k: v[0] for k, v in out.items() if v[1] == "predicted"}
    assert sorted(predicted) == [30, 31, 32, 33, 34, 35]
    for k, lab in predicted.items():
        expected = ["animal", "tech", "animal; tech"][k % 3]
        assert lab == expected, f"doc {k}: {lab!r} != {expected!r}"
    # originals keep their raw string verbatim
    assert out[2] == ("animal; tech", "original")


def test_multilabel_vocab_cap(multilabel_docs):
    with pytest.raises(ValueError, match="max_labels"):
        ml_enrich.fill_missing_multilabel(
            multilabel_docs, labels_col="labels", max_labels=1
        )


def test_fill_missing_labels(docs):
    filled, model = ml_enrich.fill_missing_labels(docs)
    out = {r["doc_id"]: (r["label_out"], r["label_source"]) for r in filled.collect()}
    assert len(out) == 30
    originals = [k for k, v in out.items() if v[1] == "original"]
    predicted = [k for k, v in out.items() if v[1] == "predicted"]
    assert len(originals) == 24 and len(predicted) == 6
    # disjoint vocabularies: the classifier must recover the parity rule
    for k in predicted:
        expected = "animal" if k % 2 == 0 else "tech"
        assert out[k][0] == expected, f"doc {k}: {out[k][0]} != {expected}"
