"""Training-data op tests: the probabilistic variants against brute force
(the SQL-expressible variants are oracle-checked by the driver contract)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bibexpy_spark.config import CANONICAL
from bibexpy_spark.entry_queries import training
from bibexpy_spark.functions import kernels

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs_pd():
    return pd.read_parquet(f"{SF}/documents.parquet")


def test_minhash_lsh_pairs_vs_bruteforce(spark, docs_pd):
    """LSH candidates + exact verify must capture every brute-force pair at
    the canonical threshold (recall gate on the documents table)."""
    got = training.d_minhash_lsh_pairs(spark, SF).toPandas()
    got_set = {tuple(sorted((a, b))) for a, b in zip(got.a_doc, got.b_doc)}

    norm = kernels.normalize_text(docs_pd["text"], CANONICAL)
    sets = kernels.shingle_sets(norm, CANONICAL)
    ids = docs_pd["doc_id"].tolist()
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if kernels.jaccard(sets[i], sets[j]) >= CANONICAL.jaccard_threshold:
                want.add(tuple(sorted((ids[i], ids[j]))))
    missing = want - got_set
    recall = 1 - len(missing) / len(want) if want else 1.0
    assert recall >= 0.99, f"missing {len(missing)} of {len(want)}: {list(missing)[:5]}"
    # and nothing below threshold sneaks in (verification is exact)
    assert got_set <= want


def test_simhash_fingerprints_match_kernel(spark, docs_pd):
    got = training.d_simhash(spark, SF).toPandas().set_index("doc_id")["simhash"]
    norm = kernels.normalize_text(docs_pd["text"], CANONICAL)
    want = kernels.simhash64(norm, CANONICAL)
    for doc_id, expected in zip(docs_pd["doc_id"], want):
        assert got[doc_id] == expected


def test_lsh_ann_recall_vs_bruteforce(spark):
    """Bucketed ANN must recover a reasonable share of true top-5 neighbors
    (8 hyperplanes, single table: recall is probabilistic, not 1.0)."""
    bf = training.e_knn_bruteforce(spark, SF).toPandas()
    ann = training.e_lsh_ann(spark, SF).toPandas()
    bf_set = set(zip(bf.query_id, bf.cand_id))
    ann_set = set(zip(ann.query_id, ann.cand_id))
    recall = len(bf_set & ann_set) / len(bf_set)
    assert recall >= 0.2, f"ANN recall collapsed: {recall}"
    # every ANN neighbor must share the query's bucket by construction and
    # carry a cosine no better than the brute-force top-1 per query
    top1 = bf[bf["rank"] == 1].set_index("query_id")["cos"]
    for q, grp in ann.groupby("query_id"):
        assert grp["cos"].max() <= top1[q] + 1e-9


def test_cosine_lsh_recall_vs_bruteforce(spark):
    """The cosine-threshold SCALE PATH (hyperplane LSH buckets, p=6/L=64)
    must recover >= 0.99 of the brute-force pairs at cos >= 0.4 — the
    VERDICT r1 requirement for replacing the crossJoin operator."""
    bf = training.e_cosine_dup_pairs(spark, SF).toPandas()
    lsh = training.e_cosine_lsh(spark, SF).toPandas()
    bf_set = {tuple(sorted((a, b))) for a, b in zip(bf.a_id, bf.b_id)}
    lsh_set = {tuple(sorted((a, b))) for a, b in zip(lsh.a_id, lsh.b_id)}
    recall = len(bf_set & lsh_set) / len(bf_set) if bf_set else 1.0
    assert recall >= 0.99, f"cosine-LSH recall {recall}"
    # precision is exact: every emitted pair is verified by true cosine
    assert lsh_set <= bf_set


def test_ivf_ann_recall_and_probe_tradeoff(spark):
    """IVF ANN (sampled-centroid coarse quantizer): recall vs brute force at
    the default probe width, and MORE probes -> recall never decreases (the
    IVF contract).  This fixture's neighbors sit at cos 0.3-0.45 — barely
    above the noise floor — so cell locality is weak by construction; on a
    clustered corpus the same operator concentrates neighbors per cell."""
    bf = training.e_knn_bruteforce(spark, SF).toPandas()
    bf_set = set(zip(bf.query_id, bf.cand_id))

    ivf4 = training.e_ivf_ann(spark, SF).toPandas()
    s4 = set(zip(ivf4.query_id, ivf4.cand_id))
    r4 = len(bf_set & s4) / len(bf_set)
    assert r4 >= 0.45, f"IVF recall collapsed: {r4}"

    ivf8 = training.e_ivf_ann(spark, SF, n_probe=8).toPandas()
    s8 = set(zip(ivf8.query_id, ivf8.cand_id))
    r8 = len(bf_set & s8) / len(bf_set)
    assert r8 >= r4  # wider probe never loses recall

    # exactness inside probed cells: reported cos equals brute-force cos
    merged = ivf4.merge(bf, on=["query_id", "cand_id"], suffixes=("_i", "_b"))
    assert (merged.cos_i == merged.cos_b).all()


def test_cosine_lsh_candidate_rate_guardrail(spark):
    """VERDICT r2: the fixture's ~63% candidate rate at p=6/L=64 must be
    REPORTED (stats row + warning), never silent."""
    import warnings

    from bibexpy_spark.entry_queries.training import (
        check_cosine_lsh_rate,
        e_cosine_lsh_stats,
    )

    stats = e_cosine_lsh_stats(spark, SF).first().asDict()
    assert stats["total_pairs"] == stats["n_vectors"] * (stats["n_vectors"] - 1) // 2
    # the documented near-crossover regime: a large fraction of all pairs
    assert 0.3 <= stats["candidate_rate"] <= 0.95
    assert stats["high_candidate_rate"] is True

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        row = check_cosine_lsh_rate(spark, SF)
    assert row["high_candidate_rate"] is True
    assert any("candidate rate" in str(w.message) for w in caught)


def test_cosine_lsh_high_threshold_knobs_are_selective(spark):
    """The docstring's claimed regime: at p=16/L=32 (the knobs for cos>=0.8
    near-dup corpora) the candidate rate on this fixture drops to a few
    percent — the S-curve steepens as promised, substantiating that the
    ~63% rate at p=6/L=64 is a knob choice, not an operator property."""
    from bibexpy_spark.entry_queries.training import e_cosine_lsh_stats

    loose = e_cosine_lsh_stats(spark, SF, n_planes=6, n_tables=64).first()
    mid = e_cosine_lsh_stats(spark, SF, n_planes=16, n_tables=32).first()
    tight = e_cosine_lsh_stats(spark, SF, n_planes=32, n_tables=8).first()
    # measured on this fixture: 0.63 -> 0.14 -> 0.04
    assert mid["candidate_rate"] < loose["candidate_rate"] / 4
    assert tight["candidate_rate"] < mid["candidate_rate"] / 3
    assert tight["candidate_rate"] < 0.05


def test_cosine_backends_agree(spark):
    """The Arrow einsum kernel and the JVM HOF expression must produce the
    SAME cosine after the callers' ROUND(.,4) — including NULL (not NaN) for
    null endpoints and zero-norm vectors, so `cos >= t` filters drop them
    under both backends."""
    from bibexpy_spark.functions import vector_ops

    rng = np.random.default_rng(7)
    rows = [(i, rng.standard_normal(16).tolist()) for i in range(60)]
    # degenerates: zero-norm, null endpoint, RAGGED dim (a truncated write /
    # schema drift row — must degrade to NULL like the HOF zip_with path,
    # never crash the kernel batch's np.stack)
    rows += [(60, [0.0] * 16), (61, None),
             (62, rng.standard_normal(8).tolist())]
    df = spark.createDataFrame(rows, "id long, emb array<double>")
    a = df.select(F.col("id").alias("a_id"), F.col("emb").alias("a"))
    b = df.select(F.col("id").alias("b_id"), F.col("emb").alias("b"))
    j = a.crossJoin(b).filter(F.col("a_id") < F.col("b_id"))

    out = j.select(
        "a_id",
        "b_id",
        F.round(vector_ops.cosine(F.col("a"), F.col("b"), "kernel"), 4).alias("ck"),
        F.round(vector_ops.cosine(F.col("a"), F.col("b"), "hof"), 4).alias("ch"),
    ).toPandas()
    assert len(out) == 63 * 62 // 2
    # null where either endpoint is degenerate, equal everywhere else
    degen = (out.a_id >= 60) | (out.b_id >= 60)
    assert out.loc[degen, "ck"].isna().all()
    assert out.loc[degen, "ch"].isna().all()
    good = out.loc[~degen]
    assert not good.ck.isna().any()
    assert (good.ck == good.ch).all()


def test_ann_and_lsh_queries_on_empty_corpus(spark, tmp_path):
    """Zero-vector corpus: the plane/centroid sizing probes find no row —
    every ANN/LSH entry must degrade to an empty (or NULL-rate) result
    instead of a driver TypeError, and ANSI 0/0 must not fire."""
    sf = str(tmp_path)
    spark.createDataFrame(
        [], "vec_id bigint, embedding array<float>, label int"
    ).write.parquet(f"{sf}/embeddings.parquet")

    assert training.e_cosine_lsh(spark, sf).count() == 0
    assert training.e_lsh_ann(spark, sf).count() == 0
    assert training.e_ivf_ann(spark, sf).count() == 0
    row = training.e_cosine_lsh_stats(spark, sf).first()
    assert row["n_vectors"] == 0
    assert row["candidate_rate"] is None
    # the guardrail materializer must not warn or crash on the NULL row
    assert training.check_cosine_lsh_rate(spark, sf)["total_pairs"] == 0
