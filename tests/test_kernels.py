"""Unit tests for the shared kernels — reference-style minimal micro-fixtures
(mirrors the reference's _rec() pattern, apps/api/tests/test_smart_merge.py:19-30).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from bibexpy_spark.config import CANONICAL, DedupConfig
from bibexpy_spark.functions import kernels


def test_normalize_unicode_fold():
    s = pd.Series(["Café  NAÏVE—test", "  hello   world  ", None])
    out = kernels.normalize_text(s, CANONICAL)
    assert out[0] == "cafe naive test"
    assert out[1] == "hello world"
    assert out[2] == ""


def test_normalize_stopwords():
    cfg = DedupConfig(stopwords=("the", "a"))
    out = kernels.normalize_text(pd.Series(["The cat saw a dog"]), cfg)
    assert out[0] == "cat saw dog"


def test_shingles_hand_computable():
    cfg = DedupConfig(shingle_k=2)
    s = pd.Series(["a b c", "a b c", "c b a"])
    sets = kernels.shingle_sets(s, cfg)
    # identical text -> identical shingle set
    assert np.array_equal(sets[0], sets[1])
    # reversed text -> different shingles
    assert not np.array_equal(sets[0], sets[2])
    # "a b c" with k=2 -> {h(a b), h(b c)}
    assert len(sets[0]) == 2


def test_shingles_short_and_empty_rows():
    cfg = DedupConfig(shingle_k=5)
    sets = kernels.shingle_sets(pd.Series(["one two", ""]), cfg)
    assert len(sets[0]) == 1        # fewer than k tokens -> one combined shingle
    assert len(sets[1]) == 1        # empty -> singleton sentinel
    assert sets[1][0] == kernels._EMPTY_SHINGLE


def test_shingles_batch_row_boundaries():
    """Flat-window shingling must not leak shingles across row boundaries."""
    cfg = DedupConfig(shingle_k=2)
    joint = kernels.shingle_sets(pd.Series(["a b", "c d"]), cfg)
    solo_ab = kernels.shingle_sets(pd.Series(["a b"]), cfg)[0]
    solo_cd = kernels.shingle_sets(pd.Series(["c d"]), cfg)[0]
    assert np.array_equal(joint[0], solo_ab)
    assert np.array_equal(joint[1], solo_cd)
    # the cross-boundary shingle "b c" must not appear anywhere
    cross = kernels.shingle_sets(pd.Series(["b c"]), cfg)[0]
    assert cross[0] not in set(joint[0]) | set(joint[1])


def test_minhash_identical_sets_identical_signatures():
    cfg = CANONICAL
    sets = kernels.shingle_sets(pd.Series(["x y z w v u t s", "x y z w v u t s"]), cfg)
    sig = kernels.minhash_signatures(sets, cfg)
    assert np.array_equal(sig[0], sig[1])


def test_minhash_similarity_estimate():
    """MinHash agreement rate approximates Jaccard."""
    rng = np.random.default_rng(7)
    base = rng.integers(0, 2**63, size=200, dtype=np.uint64)
    a = np.unique(base)
    b = np.unique(np.concatenate([base[:180], rng.integers(0, 2**63, 20, dtype=np.uint64)]))
    true_j = kernels.jaccard(np.sort(a), np.sort(b))
    sig = kernels.minhash_signatures([np.sort(a), np.sort(b)], CANONICAL)
    est = (sig[0] == sig[1]).mean()
    assert abs(est - true_j) < 0.15


def test_band_hashes_structure():
    cfg = CANONICAL
    sets = kernels.shingle_sets(pd.Series(["p q r s t u v w x y z"]), cfg)
    sig = kernels.minhash_signatures(sets, cfg)
    bh = kernels.band_hashes(sig, cfg)
    assert bh.shape == (1, cfg.bands)
    # same value in two different bands must hash differently (band idx mixed in)
    sig2 = np.zeros((1, cfg.num_perm), dtype=np.uint64)
    bh2 = kernels.band_hashes(sig2, cfg)
    assert len(np.unique(bh2)) == cfg.bands


def test_band_agreement_iff_row_agreement():
    cfg = DedupConfig(num_perm=8, bands=2, rows_per_band=4)
    sig_a = np.arange(8, dtype=np.uint64).reshape(1, 8)
    sig_b = sig_a.copy()
    sig_b[0, 7] += 1  # disturb last row of band 1 only
    bh = kernels.band_hashes(np.vstack([sig_a, sig_b]), cfg)
    assert bh[0, 0] == bh[1, 0]
    assert bh[0, 1] != bh[1, 1]


def test_simhash_distance_ordering():
    cfg = CANONICAL
    texts = pd.Series([
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",   # identical
        "alpha beta gamma delta epsilon zeta eta theta iota lambda",  # 1 token off
        "completely different words entirely unrelated content here now",
    ])
    h = kernels.simhash64(kernels.normalize_text(texts, cfg), cfg)
    d_same = kernels.hamming64(h[0:1], h[1:2])[0]
    d_near = kernels.hamming64(h[0:1], h[2:3])[0]
    d_far = kernels.hamming64(h[0:1], h[3:4])[0]
    assert d_same == 0
    assert d_near <= d_far


def test_simhash_chunk_pigeonhole():
    cfg = CANONICAL
    a = np.array([0], dtype=np.int64)
    b = np.array([0b111], dtype=np.int64)  # hamming 3 < 4 chunks
    ca = kernels.simhash_chunk_keys(a, cfg)
    cb = kernels.simhash_chunk_keys(b, cfg)
    assert (ca == cb).sum() >= 1  # at least one chunk must agree


def test_jaccard_exact():
    a = np.array([1, 2, 3, 4], dtype=np.uint64)
    b = np.array([3, 4, 5, 6], dtype=np.uint64)
    assert kernels.jaccard(a, b) == pytest.approx(2 / 6)
    assert kernels.jaccard(a, a) == 1.0


def test_count_duplicate_turn_keys(spark):
    from bibexpy_spark.operators import assembly

    rows = [("c1", 0, "u", "a", "", None), ("c1", 0, "u", "b", "", None),
            ("c1", 1, "u", "c", "", None), ("c2", 0, "u", "d", "", None)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    assert assembly.count_duplicate_turn_keys(df) == 1


def test_rolling_fingerprints_winnowing_guarantee():
    """Winnowing contract (Schleimer et al.): two texts sharing a substring
    of length >= window + k_chars - 1 share at least one fingerprint;
    identical texts produce identical sets."""
    import numpy as np
    import pandas as pd

    from bibexpy_spark.functions import kernels

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    texts = pd.Series([
        base,
        base,                                        # identical
        "zzz prefix " + base[8:40] + " suffix yyy",  # shared 32-char substring
        "completely unrelated content with no overlap at all whatsoever",
        "",                                          # empty -> sentinel
        "tiny",                                      # shorter than k
    ])
    fps = kernels.rolling_fingerprints(texts, k_chars=7, window=4)
    assert np.array_equal(fps[0], fps[1])
    assert len(np.intersect1d(fps[0], fps[2], assume_unique=True)) >= 1
    assert len(np.intersect1d(fps[0], fps[3], assume_unique=True)) == 0
    assert len(fps[4]) == 1 and len(fps[5]) == 1  # sentinels, never empty
    # density: winnowing keeps ~1/window of the raw hashes
    raw = len(base) - 7 + 1
    assert len(fps[0]) <= raw


def test_config_rejects_nonpositive_prefix_tokens():
    """containment_prefix_tokens < 1 would collapse every prefix key to ''
    and pair every empty doc with every doc (r4 review)."""
    import pytest

    with pytest.raises(ValueError, match="containment_prefix_tokens"):
        DedupConfig(containment_prefix_tokens=0)
