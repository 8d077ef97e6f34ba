"""Transcript-table queries (the dedup core) with DuckDB oracles.

The oracle-checked variants use a *SQL-expressible* normalization (lower +
non-alnum->space + collapse) so DuckDB can reproduce them exactly; the
canonical pipeline (NFKD fold + MinHash/LSH + SimHash) additionally runs as
rows-only-checked queries and is verified against the brute-force oracle in
pytest (tests/test_pipeline_golden.py) — the stronger check.

The transcripts fixture is synthesized deterministically per scale factor
(BASELINE.json: no transcript table ships in testdata; north rule says build
over exactly the input_hint shape) — both the Spark queries and the DuckDB
oracle SQL read the same parquet file, so the comparison is end-to-end real.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from bibexpy_spark import corpus, pipeline
from bibexpy_spark.config import CANONICAL
from bibexpy_spark.operators import assembly, components

K = 5  # shingle size for the SQL-expressible family (matches CANONICAL)


# ---------------------------------------------------------------------------
# shared Spark-side building blocks (SQL-expressible normalization)
# ---------------------------------------------------------------------------

def load_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(corpus.corpus_path_for_sf(sf_dir))


def conv_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assembled conversations: conv_id, n_turns, doc.

    Lean aggregation (r6): only the fields the doc ordering needs enter the
    collect_list struct — the assembly shuffle stops carrying ``ts`` and
    the unused roles/tools/first/last_ts aggregates of the full
    assemble_conversations surface.  Ordering tiebreak (turn_idx, role,
    text, tool) matches assembly.assemble_docs; rows tying on all four
    render identical text either way, so the doc is unchanged."""
    agg = load_turns(spark, sf_dir).groupBy("conv_id").agg(
        F.sort_array(
            F.collect_list(F.struct("turn_idx", "role", "text", "tool"))
        ).alias("_t")
    )
    return agg.select(
        "conv_id",
        F.size("_t").cast("long").alias("n_turns"),
        F.array_join(F.col("_t.text"), assembly.TURN_SEP).alias("doc"),
    )


def _with_sql_norm(conv: DataFrame) -> DataFrame:
    return conv.withColumn(
        "norm",
        F.trim(F.regexp_replace(F.lower(F.col("doc")), "[^a-z0-9]+", " ")),
    )


_GRAM_CACHE: dict[tuple[str, str], DataFrame] = {}


def _sql_gram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs with exact word-5-gram Jaccard >= 0.8.

    Two-phase lossless plan (operators/ngram.py): rare-gram inverted-index
    candidates + JVM array_intersect verification — equals the all-pairs SQL
    oracle while surviving hot-gram skew at scale.  The probabilistic LSH
    variant is ``t_minhash_dup_pairs`` below.  Cached per (session, sf_dir):
    three registry queries consume these pairs.
    """
    from bibexpy_spark.operators import ngram

    key = (sf_dir, spark.sparkContext.applicationId)
    if key not in _GRAM_CACHE:
        _GRAM_CACHE.clear()
        out = ngram.gram_jaccard_pairs(
            conv_df(spark, sf_dir), "conv_id", "doc", K, t_num=4, t_den=5
        ).select(F.col("a_id"), F.col("b_id"), "inter", "union_n", "jaccard")
        _GRAM_CACHE[key] = out.persist()
    return _GRAM_CACHE[key]


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_assemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    return conv_df(spark, sf_dir)


def q_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate groups by sha256 of the assembled doc (Stage-1
    analogue, reference smart_merger.py:253-265 / MergeDB.py:782-829)."""
    return (
        conv_df(spark, sf_dir)
        .withColumn("content_sha", F.sha2(F.col("doc"), 256))
        .groupBy("content_sha")
        .agg(F.count("*").alias("n_members"), F.min("conv_id").alias("rep_id"))
        .filter(F.col("n_members") > 1)
    )


def q_gram_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql_gram_pairs(spark, sf_dir)


def q_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the lossless gram-pair edges (iterative
    large-star/small-star, replacing greedy 1:1 matching,
    reference smart_merger.py:654-711).  Carries the per-cluster size
    column (window count), which also hash-checks the size distribution —
    this entry subsumes the former t_cluster_size_histogram."""
    # node universe from the raw turn table (r6): distinct conv_id over a
    # narrow column with map-side partial aggregation, instead of paying
    # the full doc-assembly shuffle just to enumerate ids — identical set
    # by construction (assembly IS a groupBy of the same rows)
    nodes = load_turns(spark, sf_dir).select("conv_id").distinct()
    edges = _sql_gram_pairs(spark, sf_dir).select("a_id", "b_id")
    # edges read the persisted gram-pair cache — skip the checkpoint job
    cl = components.connected_components(
        edges, nodes, CANONICAL, checkpoint_edges=False
    )
    return cl.withColumn(
        "cluster_sz", F.count("*").over(W.partitionBy("cluster_id"))
    )


def _containment_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-norm docs plus a deterministic 1/16 slice of WRAPPED variants
    (``zz wrap head <norm> tail qq`` under ``<conv_id>_wrap``) so the corpus
    positively contains INTERIOR containment pairs (pos > 0) — the synthetic
    ``contain`` duplicate class is prefix-anchored only.  The derivation is
    expressed identically in the DuckDB oracle (md5 bucket + string concat),
    so both sides see the same document set."""
    normed = _with_sql_norm(conv_df(spark, sf_dir)).select("conv_id", "norm")
    wraps = normed.filter(
        (F.substring(F.md5("conv_id"), 1, 1) == "0") & (F.col("norm") != "")
    ).select(
        F.concat(F.col("conv_id"), F.lit("_wrap")).alias("conv_id"),
        F.concat(F.lit("zz wrap head "), F.col("norm"), F.lit(" tail qq")).alias(
            "norm"
        ),
    )
    return normed.unionByName(wraps)


def q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE substring-containment pass (suffix pass of the north
    rule; reference analogue merge_references, MergeDB.py:210-278):
    prefix-anchored pairs ∪ interior pairs, candidates from the min-m
    shingle sketch vs the full inverted index, verified by the per-outer
    SUFFIX-ARRAY backend (kernels.suffix_array), emitting the leftmost
    match offset ``pos``.

    Restricted to the provably-lossless regime — inner has >= K tokens and
    occurs WORD-BOUNDARY-ALIGNED in the outer — where the engine's capture
    argument (aligned substring => inner's k-gram shingles ⊆ outer's, so
    inner's min-m sample necessarily hits the full index) is exact, making
    the brute-force DuckDB ``contains`` oracle an equality check, pos
    included.  Outside that regime (shorter inners, mid-token character
    matches) the engine still emits pairs but completeness is best-effort;
    the product surface is operators/containment.py, untouched here."""
    from bibexpy_spark.functions import udfs
    from bibexpy_spark.operators import containment as C

    docs = _containment_docs(spark, sf_dir)
    u = udfs.for_config(CANONICAL)
    signed = docs.select(
        "conv_id", F.col("norm").alias("norm_text")
    ).withColumn("shingles", u["shingles"](F.col("norm_text")))
    pairs = C.general_containment_pairs(signed, CANONICAL, backend="suffix_array")
    meta = docs.select(
        "conv_id",
        F.concat(F.lit(" "), F.col("norm"), F.lit(" ")).alias("pad"),
        F.size(F.split("norm", " ")).alias("ntok"),
    )
    return (
        pairs.join(
            meta.select(
                F.col("conv_id").alias("inner_id"),
                F.col("pad").alias("inner_pad"),
                F.col("ntok").alias("inner_ntok"),
            ),
            "inner_id",
        )
        .join(
            meta.select(
                F.col("conv_id").alias("outer_id"), F.col("pad").alias("outer_pad")
            ),
            "outer_id",
        )
        .filter(
            (F.col("inner_ntok") >= K)
            & F.col("outer_pad").contains(F.col("inner_pad"))
        )
        .select("inner_id", "outer_id", "pos")
    )


def q_turn_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-turn text equality invariant: assemble then explode back; counts
    must equal the raw input per conversation (input_hint invariant)."""
    turns = load_turns(spark, sf_dir)
    back = assembly.explode_back(assembly.assemble_conversations(turns))
    joined = turns.alias("i").join(
        back.alias("o"),
        (F.col("i.conv_id") == F.col("o.conv_id"))
        & (F.col("i.turn_idx") == F.col("o.turn_idx"))
        & (F.col("i.text") == F.col("o.text"))
        & (F.col("i.role") == F.col("o.role")),
        "inner",
    )
    return (
        joined.groupBy(F.col("i.conv_id").alias("conv_id"))
        .agg(F.count("*").alias("n_matched"))
    )


_PIPELINE_CACHE: dict[tuple[str, str], dict] = {}


def _canonical_run(spark: SparkSession, sf_dir: str) -> dict:
    """One canonical pipeline run shared by every pipeline-backed query in
    the same session (the driver calls each entry separately)."""
    key = (sf_dir, spark.sparkContext.applicationId)
    if key not in _PIPELINE_CACHE:
        _PIPELINE_CACHE.clear()  # one live session at a time
        _PIPELINE_CACHE[key] = pipeline.run_dedup(
            spark, load_turns(spark, sf_dir),
            with_containment=False, with_simhash_pass=True,
        )
    return _PIPELINE_CACHE[key]


def q_minhash_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical pipeline verified dup pairs (MinHash/LSH + exact Jaccard).
    No SQL oracle — probabilistic candidate generation; correctness is the
    pytest golden-fixture recall gate."""
    return _canonical_run(spark, sf_dir)["dup_edges"].select("a_id", "b_id")


def q_canonical_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full canonical pipeline cluster assignments (rows-only check)."""
    return _canonical_run(spark, sf_dir)["clusters"]


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-bucket pairs (rows-only check; oracle in pytest)."""
    return _canonical_run(spark, sf_dir)["simhash_pairs"]


def q_incremental_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup batch-equivalence, driver-checked, now covering
    BOTH delta shapes (r4): the fixture splits 70/30 on a stable conv_id
    hash into prior corpus vs new conversations, and additionally a subset
    of the PRIOR conversations holds back its final turn — the delta
    delivers the new conversations plus those held-back turns, so grown
    conversations go through retract-and-resign (prior cluster dissolved,
    conversation re-signed over the latest-wins merged turn set, former
    co-members re-clustered).  The oracle is the SAME golden parquet as
    t_canonical_clusters — the incremental path must reproduce the
    full-batch clustering over the FINAL turn set bit-for-bit
    (bibexpy_spark/incremental.py docstring for the equivalence argument)."""
    from bibexpy_spark import incremental

    turns = load_turns(spark, sf_dir)
    is_new = F.abs(F.xxhash64("conv_id")) % 10 >= 7
    is_grown = (~is_new) & (F.abs(F.xxhash64("conv_id", F.lit(1))) % 5 == 0)
    mx = F.max("turn_idx").over(W.partitionBy("conv_id"))
    t2 = turns.withColumn("_held", is_grown & (F.col("turn_idx") == mx) & (mx > 0))
    old_phase = t2.filter(~is_new & ~F.col("_held")).drop("_held")
    delta = t2.filter(is_new | F.col("_held")).drop("_held")
    prior = pipeline.run_dedup(
        spark, old_phase,
        with_containment=False, with_simhash_pass=False,
    )
    incr = incremental.run_incremental_dedup(
        spark, delta, prior["signed"], prior["clusters"],
        prior_turns=old_phase,
    )
    return incr["clusters"]


# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------

def _fixture(sf: str) -> str:
    return f"read_parquet('/root/repo/data/transcripts_{sf}.parquet')"


_SF = "sf0.01"  # the driver's correctness scale

_CONV = f"""
  SELECT conv_id,
         CAST(count(*) AS BIGINT) AS n_turns,
         string_agg(text, chr(10) ORDER BY turn_idx) AS doc
  FROM {_fixture(_SF)}
  GROUP BY conv_id
"""

_NORM = "trim(regexp_replace(lower(doc), '[^a-z0-9]+', ' ', 'g'))"

_GRAMS = f"""
  WITH conv AS ({_CONV}),
  normed AS (SELECT conv_id, {_NORM} AS norm FROM conv),
  toks AS (SELECT conv_id, norm, string_split(norm, ' ') AS t FROM normed),
  grams AS (
    SELECT conv_id,
           unnest(list_distinct(
             CASE WHEN len(t) >= {K}
                  THEN list_transform(range(1, len(t) - {K} + 2),
                       i -> array_to_string(list_slice(t, i, i + {K} - 1), ' '))
                  ELSE [norm] END)) AS g
    FROM toks
  )
"""

_PAIRS = f"""
  {_GRAMS},
  sizes AS (SELECT conv_id, CAST(count(*) AS BIGINT) AS n FROM grams GROUP BY conv_id),
  shared AS (
    SELECT x.conv_id AS a_id, y.conv_id AS b_id, CAST(count(*) AS BIGINT) AS inter
    FROM grams x JOIN grams y ON x.g = y.g AND x.conv_id < y.conv_id
    GROUP BY 1, 2
  ),
  pairs AS (
    SELECT a_id, b_id, inter, sa.n + sb.n - inter AS union_n
    FROM shared
    JOIN sizes sa ON sa.conv_id = a_id
    JOIN sizes sb ON sb.conv_id = b_id
    WHERE inter * 5 >= (sa.n + sb.n - inter) * 4
  )
"""

QUERIES = {
    "t_assemble": q_assemble,
    "t_exact_dup_groups": q_exact_dup_groups,
    "t_gram_dup_pairs": q_gram_dup_pairs,
    "t_clusters": q_clusters,
    "t_containment": q_containment,
    "t_turn_roundtrip": q_turn_roundtrip,
    "t_minhash_dup_pairs": q_minhash_dup_pairs,
    "t_canonical_clusters": q_canonical_clusters,
    "t_simhash_pairs": q_simhash_pairs,
    "t_incremental_clusters": q_incremental_clusters,
}

ORACLES = {
    "t_assemble": _CONV,
    "t_exact_dup_groups": f"""
      WITH conv AS ({_CONV})
      SELECT sha256(doc) AS content_sha,
             CAST(count(*) AS BIGINT) AS n_members,
             min(conv_id) AS rep_id
      FROM conv GROUP BY 1 HAVING count(*) > 1
    """,
    "t_gram_dup_pairs": f"""
      {_PAIRS}
      SELECT a_id, b_id, inter, union_n,
             ROUND(CAST(inter AS DOUBLE) / union_n, 6) AS jaccard
      FROM pairs
    """,
    "t_clusters": f"""
      {_PAIRS},
      edges AS (
        SELECT a_id AS src, b_id AS dst FROM pairs
        UNION ALL SELECT b_id, a_id FROM pairs
      ),
      nodes AS (SELECT conv_id FROM ({_CONV})),
      reach AS (
        WITH RECURSIVE r(node, lab) AS (
          SELECT conv_id, conv_id FROM nodes
          UNION
          SELECT e.dst, r.lab FROM r JOIN edges e ON e.src = r.node
          WHERE r.lab < e.dst
        ) SELECT * FROM r
      )
      SELECT conv_id, cluster_id,
             CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_sz
      FROM (SELECT node AS conv_id, min(lab) AS cluster_id FROM reach GROUP BY node)
    """,
    "t_containment": f"""
      WITH conv AS ({_CONV}),
      normed AS (SELECT conv_id, {_NORM} AS norm FROM conv),
      docs AS (
        SELECT conv_id, norm FROM normed
        UNION ALL
        SELECT conv_id || '_wrap', 'zz wrap head ' || norm || ' tail qq'
        FROM normed WHERE substr(md5(conv_id), 1, 1) = '0' AND norm <> ''
      ),
      keyed AS (
        SELECT conv_id, norm, length(norm) AS len,
               len(string_split(norm, ' ')) AS ntok,
               ' ' || norm || ' ' AS pad
        FROM docs
      )
      SELECT a.conv_id AS inner_id, b.conv_id AS outer_id,
             CAST(strpos(b.norm, a.norm) - 1 AS BIGINT) AS pos
      FROM keyed a JOIN keyed b
        ON a.len < b.len AND a.ntok >= {K} AND contains(b.pad, a.pad)
    """,
    "t_turn_roundtrip": f"""
      SELECT conv_id, CAST(count(*) AS BIGINT) AS n_matched
      FROM {_fixture(_SF)}
      GROUP BY conv_id
    """,
}

# Golden-parquet oracles for the kernel-backed (non-SQL-expressible) family:
# ground truth precomputed by the independent single-process pipeline in
# bibexpy_spark.golden (python dict buckets + union-find over the shared,
# pytest-bruteforce-verified kernels); DuckDB reads the parquet back.
from bibexpy_spark import golden as _golden  # noqa: E402

ORACLES.update(
    {
        "t_minhash_dup_pairs": _golden.oracle_sql_for("t_minhash_dup_pairs"),
        "t_canonical_clusters": _golden.oracle_sql_for("t_canonical_clusters"),
        "t_simhash_pairs": _golden.oracle_sql_for("t_simhash_pairs"),
        # incremental must reproduce the full-batch clustering exactly
        "t_incremental_clusters": _golden.oracle_sql_for("t_canonical_clusters"),
    }
)
