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
