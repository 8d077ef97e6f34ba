"""Property-based tests (hypothesis) over the shared kernels — beyond the
reference's example-based suite (SURVEY.md §5 notes it has none)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from bibexpy_spark.config import CANONICAL, DedupConfig
from bibexpy_spark.functions import kernels

text_st = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=200,
)


@given(st.lists(text_st, min_size=1, max_size=20))
@settings(max_examples=50, deadline=None)
def test_normalize_idempotent(texts):
    s = pd.Series(texts)
    once = kernels.normalize_text(s, CANONICAL)
    twice = kernels.normalize_text(once, CANONICAL)
    assert once.tolist() == twice.tolist()


@given(st.lists(text_st, min_size=1, max_size=20))
@settings(max_examples=50, deadline=None)
def test_normalize_output_charset(texts):
    out = kernels.normalize_text(pd.Series(texts), CANONICAL)
    for v in out:
        assert all(c.islower() or c.isdigit() or c == " " for c in v), repr(v)
        assert "  " not in v and v == v.strip()


@given(st.lists(text_st, min_size=1, max_size=16))
@settings(max_examples=30, deadline=None)
def test_shingles_batch_equals_single(texts):
    """Batched flat-window shingling == per-row shingling (no cross-row
    leakage, no batch-order dependence)."""
    s = pd.Series(texts)
    norm = kernels.normalize_text(s, CANONICAL)
    batch = kernels.shingle_sets(norm, CANONICAL)
    for i in range(len(norm)):
        solo = kernels.shingle_sets(norm.iloc[[i]].reset_index(drop=True), CANONICAL)[0]
        assert np.array_equal(batch[i], solo)


@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=1,
             max_size=200, unique=True),
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=1,
             max_size=200, unique=True),
)
@settings(max_examples=50, deadline=None)
def test_jaccard_bounds_and_symmetry(a, b):
    x = np.sort(np.array(a, dtype=np.uint64))
    y = np.sort(np.array(b, dtype=np.uint64))
    j1 = kernels.jaccard(x, y)
    j2 = kernels.jaccard(y, x)
    assert 0.0 <= j1 <= 1.0
    assert j1 == j2
    assert kernels.jaccard(x, x) == 1.0


@given(st.data())
@settings(max_examples=20, deadline=None)
def test_minhash_agreement_tracks_jaccard(data):
    rng_seed = data.draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(rng_seed)
    base = np.unique(rng.integers(0, 2**63, size=300, dtype=np.uint64))
    keep = data.draw(st.integers(min_value=50, max_value=len(base)))
    a = base
    b = np.unique(
        np.concatenate([base[:keep], rng.integers(0, 2**63, size=len(base) - keep,
                                                  dtype=np.uint64)])
    )
    true_j = kernels.jaccard(np.sort(a), np.sort(b))
    sig = kernels.minhash_signatures([np.sort(a), np.sort(b)], CANONICAL)
    est = float((sig[0] == sig[1]).mean())
    # 128 perms: std ~ sqrt(j(1-j)/128) <= 0.045; allow 5 sigma
    assert abs(est - true_j) < 0.25


@given(st.lists(text_st, min_size=2, max_size=10))
@settings(max_examples=30, deadline=None)
def test_simhash_identical_text_identical_hash(texts):
    s = pd.Series(texts + texts)  # duplicates in the same batch
    norm = kernels.normalize_text(s, CANONICAL)
    h = kernels.simhash64(norm, CANONICAL)
    n = len(texts)
    assert np.array_equal(h[:n], h[n:])


@given(st.lists(st.integers(0, 2**62), min_size=5, max_size=60, unique=True))
@settings(max_examples=30, deadline=None)
def test_band_hash_count_and_determinism(vals):
    cfg = CANONICAL
    sets = [np.sort(np.array(vals, dtype=np.uint64))]
    sig = kernels.minhash_signatures(sets, cfg)
    b1 = kernels.band_hashes(sig, cfg)
    b2 = kernels.band_hashes(sig.copy(), cfg)
    assert b1.shape == (1, cfg.bands)
    assert np.array_equal(b1, b2)


ascii_word = st.text(alphabet="abcdefghij ", min_size=30, max_size=120)


@given(ascii_word, ascii_word, st.integers(min_value=0, max_value=20))
@settings(max_examples=40, deadline=None)
def test_rolling_fp_substring_guarantee(a, tail, cut):
    """Winnowing guarantee under random composition: embedding a long-enough
    slice of one text inside another always yields a shared fingerprint."""
    k, w = 7, 4
    need = w + k - 1
    sub = a[cut: cut + max(need, 12)]
    if len(sub) < need:
        return
    b = "zzzz " + sub + " qqqq" + tail
    fps = kernels.rolling_fingerprints(pd.Series([a, b]), k, w)
    assert len(np.intersect1d(fps[0], fps[1], assume_unique=True)) >= 1


@given(st.lists(ascii_word, min_size=1, max_size=10))
@settings(max_examples=30, deadline=None)
def test_rolling_fp_batch_equals_single(texts):
    """Batch-invariance: fingerprints of a row do not depend on its batch."""
    batch = kernels.rolling_fingerprints(pd.Series(texts))
    for i, t in enumerate(texts):
        solo = kernels.rolling_fingerprints(pd.Series([t]))[0]
        assert np.array_equal(batch[i], solo)


@given(
    st.dictionaries(
        st.sampled_from([f"u{i}" for i in range(8)]),
        st.sets(st.sampled_from(list("abcdefg")), max_size=3),
        min_size=2,
        max_size=8,
    )
)
@settings(max_examples=40, deadline=None)
def test_field_components_partition_properties(assignments):
    """Author-split component partition (pure logic, mirrored from
    entity_blocks): components cover every with-field record exactly once
    and are pairwise field-disjoint."""
    recs = [{"record": r, "fields": fs} for r, fs in sorted(assignments.items()) if fs]
    comps: list[list[dict]] = []
    for r in recs:
        hit = [ci for ci, comp in enumerate(comps)
               if any(r["fields"] & x["fields"] for x in comp)]
        if not hit:
            comps.append([r])
        else:
            first = hit[0]
            comps[first].append(r)
            for ci in sorted(hit[1:], reverse=True):
                comps[first].extend(comps[ci])
                del comps[ci]
    covered = [x["record"] for comp in comps for x in comp]
    assert sorted(covered) == [r["record"] for r in recs]
    for i in range(len(comps)):
        fi = {f for x in comps[i] for f in x["fields"]}
        for j in range(i + 1, len(comps)):
            fj = {f for x in comps[j] for f in x["fields"]}
            assert not (fi & fj), "components must be field-disjoint"
