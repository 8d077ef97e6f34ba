"""Plan-shape regression tests: the scale contract, assertable.

These are the properties the engine must keep at 100 TB: pushdown reaches
the scan, small dims broadcast, verification stays JVM-side.  A refactor
that silently breaks one of them fails here, not in production."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bibexpy_spark.plans import inspect

SF = "/root/testdata/sf0.01"


def test_range_filter_pushdown(spark):
    from bibexpy_spark.entry_queries.relational import q_range_filter

    df = q_range_filter(spark, SF)
    assert inspect.has_pushed_filter(df, "GreaterThanOrEqual(o_totalprice")
    assert inspect.has_pushed_filter(df, "o_orderdate")


def test_facets_column_pruning(spark):
    from bibexpy_spark.entry_queries.relational import q_facets_topn

    schemas = inspect.read_schemas(q_facets_topn(spark, SF))
    assert schemas and "event_type" in schemas[0]
    assert "props" not in schemas[0] and "value" not in schemas[0]


def test_blocking_join_broadcasts_dims(spark):
    from bibexpy_spark.entry_queries.relational import q_blocking_join

    assert "BroadcastHashJoin" in inspect.join_strategies(q_blocking_join(spark, SF))


def test_verify_join_is_jvm_side(spark):
    """The Jaccard verification subplan adds NO Python nodes beyond the
    cached signature stage it consumes."""
    from bibexpy_spark.config import CANONICAL
    from bibexpy_spark.functions import udfs
    from bibexpy_spark.operators import lsh, verify as verify_op

    d = spark.read.parquet(f"{SF}/documents.parquet").withColumnRenamed(
        "doc_id", "conv_id"
    )
    signed = udfs.with_signature_columns(d, CANONICAL, text_col="text").persist()
    signed.count()  # materialize cache so downstream plans reference it
    base = inspect.python_eval_nodes(signed)
    pairs, _ = lsh.candidate_pairs(signed, CANONICAL)
    verified = verify_op.verify_pairs(pairs, signed, CANONICAL)
    # candidate+verify reference the cached stage several times; each
    # reference reprints the same subtree — per-reference count must not
    # exceed the signature stage's own count
    n_refs = inspect.explain_formatted(verified).count("InMemoryTableScan")
    assert n_refs >= 2
    assert inspect.python_eval_nodes(verified) <= base * n_refs
    signed.unpersist()


def test_exact_groups_narrow_aggregation(spark):
    """exact_groups must aggregate a narrow projection, not window the wide
    signature payload: the rep-map side of the join reads only
    (content_sha, id)."""
    from bibexpy_spark.config import CANONICAL
    from bibexpy_spark.functions import udfs
    from bibexpy_spark.operators import exact

    d = spark.read.parquet(f"{SF}/documents.parquet").withColumnRenamed(
        "doc_id", "conv_id"
    )
    signed = udfs.with_signature_columns(d, CANONICAL, text_col="text")
    plan = inspect.explain_formatted(exact.exact_groups(signed))
    assert "Window" not in plan  # narrow agg+join replaced the wide window


def test_cosine_lsh_has_no_cartesian(spark):
    """The cosine scale path must be a bucketed equi-join — no
    CartesianProduct / BroadcastNestedLoopJoin anywhere in the plan
    (e_cosine_dup_pairs is the brute-force oracle and MAY cross-join;
    e_cosine_lsh must not)."""
    from bibexpy_spark.entry_queries.training import e_cosine_lsh

    df = e_cosine_lsh(spark, SF)
    strategies = inspect.join_strategies(df)
    assert "CartesianProduct" not in strategies
    assert "BroadcastNestedLoopJoin" not in strategies


def test_apply_splits_broadcasts_assignments(spark):
    """Split assignments are tiny relative to the record table — the apply
    join must broadcast them, not shuffle the records."""
    from bibexpy_spark.operators import entity_blocks as eb

    records = spark.createDataFrame(
        [("u1", "Zipf A", "Physics", ""), ("u2", "Zipf A", "Biology", "")],
        ["UID", "AU", "WC", "SC"],
    )
    splits = spark.createDataFrame(
        [("zipf_a", "Zipf A", "zipf a", 1, 1, "(b)", ["u2"], ["biology"])],
        "split_id string, name string, norm string, tier int, group_idx int,"
        " suffix string, records array<string>, fields array<string>",
    )
    out = eb.apply_author_splits(records, splits, id_col="UID")
    assert "BroadcastHashJoin" in inspect.join_strategies(out)


def test_ngram_index_no_cartesian(spark):
    from bibexpy_spark.operators import ngram

    d = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = ngram.gram_jaccard_pairs(d, "doc_id", "text", 3, 1, 2)
    strategies = inspect.join_strategies(pairs)
    assert "CartesianProduct" not in strategies
    assert "BroadcastNestedLoopJoin" not in strategies


def test_verify_gram_pairs_chain_reuses_side_exchange(spark):
    """r6 verify shape: the endpoint-join chain projects ``hashed``
    canonically identically on both sides, so the planner must REUSE one
    exchange of the array-carrying side table (R + P array shipments, vs
    the r3 regroup's R + 2P through its pair-key groupBy) — and the plan
    must contain no pair-key aggregation shuffling arrays at all."""
    from bibexpy_spark.operators import ngram

    d = spark.read.parquet(f"{SF}/documents.parquet")
    g = ngram.with_grams(d, "doc_id", "text", 3)
    hashed = g.select(
        "id",
        F.array_sort(
            F.array_distinct(F.transform("grams", lambda s: F.xxhash64(s)))
        ).alias("gh"),
    )
    cand = spark.createDataFrame(
        [(1, 2), (2, 5), (3, 9)], "a_id long, b_id long"
    )

    # at fixture scale the optimizer broadcasts `hashed` and hides every
    # shuffle — disable auto-broadcast so the plan shows its 100-TB shape
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        new = ngram.verify_gram_pairs(cand, hashed, 1, 2)
        new.collect()
        plan = new._jdf.queryExecution().executedPlan().toString()
        # one endpoint fetch reuses the other's exchange of the side table
        assert "ReusedExchange" in plan
        # no aggregation anywhere in verify: arrays never cross a pair-key
        # groupBy shuffle (the r3 regroup's unconditional 2P cost)
        assert "HashAggregate" not in plan and "ObjectHashAggregate" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # and the result is still exact: spot-check one known pair end-to-end
    out = ngram.gram_jaccard_pairs(d, "doc_id", "text", 3, 1, 2)
    assert out.count() == 25  # the oracle-checked sf0.01 answer


def test_incremental_plan_no_cartesian(spark):
    """The incremental delta path is equi-joins + window + CC all the way:
    no CartesianProduct / BroadcastNestedLoopJoin anywhere in the final
    clusters plan."""
    from bibexpy_spark import corpus, incremental, pipeline

    path = corpus.corpus_path_for_sf("/root/testdata/sf0.001")
    turns = spark.read.parquet(path)
    is_new = F.abs(F.xxhash64("conv_id")) % 10 >= 7
    prior = pipeline.run_dedup(
        spark, turns.filter(~is_new),
        with_containment=False, with_simhash_pass=False,
    )
    incr = incremental.run_incremental_dedup(
        spark, turns.filter(is_new), prior["signed"], prior["clusters"]
    )
    for df in (incr["candidate_pairs"], incr["clusters"]):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_general_containment_no_cartesian(spark):
    """The complete containment pass (prefix ∪ interior, batch AND delta)
    is equi-joins only: no CartesianProduct / BroadcastNestedLoopJoin in
    either plan, for either verify backend."""
    from bibexpy_spark import corpus
    from bibexpy_spark.config import CANONICAL
    from bibexpy_spark.functions import udfs
    from bibexpy_spark.operators import assembly, containment

    path = corpus.corpus_path_for_sf("/root/testdata/sf0.001")
    turns = spark.read.parquet(path)
    is_new = F.abs(F.xxhash64("conv_id")) % 10 >= 7

    def signed(df):
        conv = assembly.assemble_docs(df)
        return udfs.with_signature_columns(conv, CANONICAL, text_col="doc")

    old, new = signed(turns.filter(~is_new)), signed(turns.filter(is_new))
    for df in (
        containment.general_containment_pairs(old, CANONICAL, backend="contains"),
        containment.general_containment_pairs(old, CANONICAL, backend="suffix_array"),
        containment.general_containment_pairs_delta(old, new, CANONICAL),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_assembly_projection_is_codegen_native(spark):
    """The assemble stage's doc/roles/tools projection must not use
    HigherOrderFunctions (transform/filter lambdas are CodegenFallback and
    run on the interpreted expression path — the gram-stage first-run cliff
    class, PLANS.md r4).  Struct-field extraction + array_join/concat_ws/
    array_remove keep the whole projection inside WholeStageCodegen."""
    from bibexpy_spark import corpus
    from bibexpy_spark.operators import assembly

    path = corpus.corpus_path_for_sf("/root/testdata/sf0.001")
    turns = spark.read.parquet(path)
    for df in (
        assembly.assemble_conversations(turns),
        assembly.assemble_docs(turns, include_roles_tools=True),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "transform(" not in plan, plan
        assert "lambdafunction" not in plan, plan


def test_assemble_docs_accepts_minimal_turn_schema(spark):
    """The lean path's documented shape — a (conv_id, turn_idx, text) frame
    without role/tool, e.g. a foreachBatch source — must still assemble
    (r4 review: unconditional role/tool refs raised UNRESOLVED_COLUMN),
    and a full-schema frame must produce the identical doc."""
    from bibexpy_spark.operators import assembly

    full = spark.createDataFrame(
        [("c1", 0, "u", "hi", ""), ("c1", 1, "a", "there", "")],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    lean = full.select("conv_id", "turn_idx", "text")
    got_lean = {r["conv_id"]: r["doc"] for r in assembly.assemble_docs(lean).collect()}
    got_full = {r["conv_id"]: r["doc"] for r in assembly.assemble_docs(full).collect()}
    assert got_lean == got_full
    with_opts = assembly.assemble_docs(lean, include_roles_tools=True).first()
    assert with_opts["roles"] == " " and with_opts["tools"] == ""


def test_verify_empty_shingle_pair_is_not_dup(spark):
    """Two conversations whose shingle sets are both EMPTY have undefined
    similarity (0/0) and must not verify as duplicates — the integer
    threshold compare alone would pass 0 >= 0 (r4 review)."""
    from bibexpy_spark.config import CANONICAL
    from bibexpy_spark.operators import verify as verify_op

    signed = spark.createDataFrame(
        [("a", []), ("b", []), ("c", [1, 2, 3]), ("d", [1, 2, 3])],
        "conv_id string, shingles array<long>",
    )
    pairs = spark.createDataFrame(
        [("a", "b"), ("c", "d")], "a_id string, b_id string"
    )
    out = {
        r["a_id"]: (r["is_dup"], r["jaccard"])
        for r in verify_op.verify_pairs(pairs, signed, CANONICAL).collect()
    }
    assert out["a"][0] is False          # empty-vs-empty: never a dup
    assert out["c"] == (True, 1.0)       # identical non-empty sets still pass


def test_gram_verify_empty_arrays_emit_no_pair(spark):
    """ngram.verify_gram_pairs: empty gram arrays on both sides must not
    emit a pair via 0 >= 0 (r4 review, same guard class as verify_pairs)."""
    from bibexpy_spark.operators import ngram

    side = spark.createDataFrame(
        [("a", []), ("b", []), ("c", [7, 8]), ("d", [7, 8])],
        "id string, gh array<long>",
    )
    cand = spark.createDataFrame(
        [("a", "b"), ("c", "d")], "a_id string, b_id string"
    )
    rows = ngram.verify_gram_pairs(cand, side, 1, 2).collect()
    assert {(r["a_id"], r["b_id"]) for r in rows} == {("c", "d")}


def test_simhash_hot_bucket_star_fallback(spark):
    """A hot (chunk_idx, chunk_val) bucket must degrade to the star
    pattern (n-1 pairs through the bucket rep), not a quadratic self-join
    — the lsh.candidate_pairs policy applied to the SimHash pass (r4
    review).  Identical docs share every chunk, so the star still connects
    all of them at hamming 0."""
    from dataclasses import replace

    from bibexpy_spark.config import CANONICAL
    from bibexpy_spark.operators import simhash as sh

    n = 8
    simmed = spark.createDataFrame(
        [(f"c{i:02d}", 1234567) for i in range(n)]
        + [("z1", 7654321), ("z2", 7654321 ^ 1)],   # hamming-1 pair, cold bucket
        "conv_id string, simhash long",
    )
    cfg = replace(CANONICAL, hot_chunk_cap=4)
    pairs = {
        (r["a_id"], r["b_id"])
        for r in sh.simhash_pairs(simmed, cfg).collect()
    }
    star = {(f"c00", f"c{i:02d}") for i in range(1, n)}
    assert star <= pairs                       # all members reach the rep
    assert ("z1", "z2") in pairs               # cold bucket: exact pairs kept
    assert len([p for p in pairs if p[0].startswith("c")]) == n - 1
    # below the cap the exact all-pairs set comes back
    full = {
        (r["a_id"], r["b_id"])
        for r in sh.simhash_pairs(simmed, CANONICAL).collect()
        if r["a_id"].startswith("c")
    }
    assert len(full) == n * (n - 1) // 2
    # stats are never silent about star mode
    st = sh.simhash_chunk_stats(simmed, cfg).collect()[0]
    assert st["n_hot_buckets"] > 0 and st["max_bucket_n"] == n + 2  # high chunks are 0 for ALL small ints -> one all-rows bucket


def test_simhash_delta_matches_batch_with_star(spark):
    """prior ∪ delta == batch over everything, star mode included, while
    no bucket crosses the cap between batches (r4 review)."""
    from dataclasses import replace

    from bibexpy_spark.config import CANONICAL
    from bibexpy_spark.operators import simhash as sh

    cfg = replace(CANONICAL, hot_chunk_cap=3)
    old = spark.createDataFrame(
        [(f"h{i}", 999) for i in range(6)] + [("q1", 555)],
        "conv_id string, simhash long",
    )
    new = spark.createDataFrame(
        [("n1", 999), ("n2", 555 ^ 2)], "conv_id string, simhash long"
    )
    batch = {
        (r["a_id"], r["b_id"])
        for r in sh.simhash_pairs(old.unionByName(new), cfg).collect()
    }
    prior = {
        (r["a_id"], r["b_id"]) for r in sh.simhash_pairs(old, cfg).collect()
    }
    delta = {
        (r["a_id"], r["b_id"])
        for r in sh.simhash_pairs_delta(old, new, cfg).collect()
    }
    assert prior | delta == batch
    assert all("n" in a or "n" in b for a, b in delta)
