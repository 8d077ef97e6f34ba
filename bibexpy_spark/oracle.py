"""Brute-force exact dedup oracle (pure pandas/numpy, no Spark).

Computes ground truth for the golden cluster-assignment fixtures
(FIXTURES.md §3): canonical normalization -> k-shingles -> ALL-PAIRS exact
Jaccard -> threshold -> exact transitive closure.  Cluster truth is defined
by single-link transitive closure — the same semantics as the reference's
greedy clusterer (reference blocking.py:116-140 joins a mention to a cluster
if it matches ANY member), but order-independent, so the Spark pipeline's
connected-components output is well-defined against it (SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from bibexpy_spark.config import CANONICAL, DedupConfig
from bibexpy_spark.functions import kernels


def assemble(turns: pd.DataFrame) -> pd.DataFrame:
    """Turn table -> conversation table, ordered by turn_idx (stable)."""
    t = turns.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    conv = (
        t.groupby("conv_id", sort=True)
        .agg(
            doc=("text", lambda s: "\n".join(s)),
            n_turns=("text", "size"),
            roles=("role", lambda s: " ".join(s)),
            tools=("tool", lambda s: " ".join(x for x in s if x)),
        )
        .reset_index()
    )
    return conv


def all_pairs_jaccard(
    conv: pd.DataFrame, cfg: DedupConfig = CANONICAL
) -> pd.DataFrame:
    """All-pairs exact Jaccard over shingle sets; returns pairs >= threshold.

    O(n^2) — fixture scale only (200–2000 conversations).
    """
    norm = kernels.normalize_text(conv["doc"], cfg)
    sets = kernels.shingle_sets(norm, cfg)
    ids = conv["conv_id"].tolist()
    n = len(ids)
    out = []
    for i in range(n):
        for j in range(i + 1, n):
            jac = kernels.jaccard(sets[i], sets[j])
            if jac >= cfg.jaccard_threshold:
                a, b = sorted((ids[i], ids[j]))
                out.append((a, b, jac))
    return pd.DataFrame(out, columns=["a_id", "b_id", "jaccard"])


def transitive_closure(ids: list[str], pairs: pd.DataFrame) -> pd.DataFrame:
    """Exact connected components via union-find; cluster_id = min(conv_id)."""
    parent = {i: i for i in ids}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["a_id"], pairs["b_id"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = [(i, find(i)) for i in ids]
    return pd.DataFrame(rows, columns=["conv_id", "cluster_id"])


def golden_fixtures(
    turns: pd.DataFrame, cfg: DedupConfig = CANONICAL
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """(golden_pairs, golden_clusters) for a turn-level corpus."""
    conv = assemble(turns)
    pairs = all_pairs_jaccard(conv, cfg)
    clusters = transitive_closure(conv["conv_id"].tolist(), pairs)
    return pairs, clusters


def containment_pairs(conv: pd.DataFrame, cfg: DedupConfig = CANONICAL) -> pd.DataFrame:
    """All-pairs exact substring containment on normalized docs (oracle for
    the suffix/containment pass).  Returns (inner_id, outer_id) with
    inner strictly contained in outer and inner != outer."""
    norm = kernels.normalize_text(conv["doc"], cfg).tolist()
    ids = conv["conv_id"].tolist()
    out = []
    for i in range(len(ids)):
        for j in range(len(ids)):
            if i != j and len(norm[i]) < len(norm[j]) and norm[i] and norm[i] in norm[j]:
                out.append((ids[i], ids[j]))
    return pd.DataFrame(out, columns=["inner_id", "outer_id"])


def simhash_pairs(conv: pd.DataFrame, cfg: DedupConfig = CANONICAL) -> pd.DataFrame:
    """All-pairs SimHash Hamming <= max over (text + role/tool sequence)."""
    feat = kernels.normalize_text(
        conv["doc"] + " " + conv["roles"].fillna("") + " " + conv["tools"].fillna(""), cfg
    )
    sims = kernels.simhash64(feat, cfg)
    ids = conv["conv_id"].tolist()
    n = len(ids)
    out = []
    for i in range(n):
        d = kernels.hamming64(np.repeat(sims[i], n - i - 1), sims[i + 1:])
        for off in np.nonzero(d <= cfg.simhash_hamming_max)[0]:
            j = i + 1 + int(off)
            a, b = sorted((ids[i], ids[j]))
            out.append((a, b, int(d[off])))
    return pd.DataFrame(out, columns=["a_id", "b_id", "hamming"])
