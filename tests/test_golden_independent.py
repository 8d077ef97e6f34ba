"""Golden-oracle independence gate (VERDICT r2 "what's wrong" #3).

Two halves:
  1. STATIC: bibexpy_spark/golden.py must not import anything from
     bibexpy_spark.functions — the golden oracle and the engine may share
     no code, only specs (seeds, constants, dictionaries).
  2. BIT-EQUALITY: the independent reimplementations in golden.py must
     agree bit-for-bit with the engine kernels on adversarial deterministic
     corpora.  If an engine kernel regresses, this test (not just the
     contract) pinpoints which kernel.
"""

from __future__ import annotations

import ast
import random
import string

import numpy as np
import pandas as pd
import pytest

from bibexpy_spark import golden
from bibexpy_spark.config import CANONICAL
from bibexpy_spark.functions import kernels
from bibexpy_spark.functions import c1_address as c1
from bibexpy_spark.functions.bibex_norms import jaro_winkler


def _random_texts(n: int = 80, seed: int = 11) -> pd.Series:
    rng = random.Random(seed)
    alphabet = string.ascii_letters + string.digits + " .,;-_()[]"
    accents = "éüñçàößşığÉÜ漢字日本語"
    out = []
    for i in range(n):
        length = rng.randint(0, 160)
        chars = [rng.choice(alphabet + (accents if i % 3 == 0 else "")) for _ in range(length)]
        out.append("".join(chars))
    out += ["", "   ", "a", "é́ combined", None, "ZZ  zz\t\nZZ"]
    return pd.Series(out, dtype=object)


def test_golden_has_no_functions_imports():
    src = open("/root/repo/bibexpy_spark/golden.py").read()
    tree = ast.parse(src)
    offenders = []
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module and "functions" in node.module:
            offenders.append(ast.dump(node))
        if isinstance(node, ast.Import):
            for alias in node.names:
                if "functions" in alias.name:
                    offenders.append(alias.name)
    assert not offenders, f"golden.py imports engine function modules: {offenders}"


def test_normalize_bit_equal():
    texts = _random_texts()
    eng = kernels.normalize_text(texts, CANONICAL).tolist()
    gold = golden._g_norm_series(texts, CANONICAL).tolist()
    assert eng == gold


def test_shingle_signature_band_bit_equal():
    texts = _random_texts(seed=23)
    norm_e = kernels.normalize_text(texts, CANONICAL)
    sh_e = kernels.shingle_sets(norm_e, CANONICAL)
    sh_g = golden._g_shingle_sets(golden._g_norm_series(texts, CANONICAL), CANONICAL)
    assert len(sh_e) == len(sh_g)
    for a, b in zip(sh_e, sh_g):
        assert np.array_equal(np.sort(a), np.sort(b))
    sig_e = kernels.minhash_signatures(sh_e, CANONICAL)
    sig_g = golden._g_signatures(sh_g, CANONICAL)
    assert np.array_equal(sig_e, sig_g)
    assert np.array_equal(
        kernels.band_hashes(sig_e, CANONICAL), golden._g_band_hashes(sig_g, CANONICAL)
    )


def test_simhash_bit_equal():
    texts = _random_texts(seed=37)
    norm = kernels.normalize_text(texts, CANONICAL)
    eng = kernels.simhash64(norm, CANONICAL)
    gold = np.array(
        [golden._g_simhash(s) for s in golden._g_norm_series(texts, CANONICAL)],
        dtype=np.uint64,
    ).view(np.int64)
    assert np.array_equal(eng, gold)


def test_winnow_bit_equal():
    texts = _random_texts(seed=53).fillna("").astype(str).str.lower()
    eng = kernels.rolling_fingerprints(texts)
    gold = golden._g_winnow_series(texts)
    for a, b in zip(eng, gold):
        assert np.array_equal(np.sort(a), np.sort(b))


def test_sha256_bit_equal():
    texts = _random_texts(seed=67).fillna("").astype(str)
    assert kernels.content_sha256(texts).tolist() == golden._g_sha256_series(texts).tolist()


@pytest.mark.parametrize(
    "a,b",
    [
        ("", ""), ("a", ""), ("martha", "marhta"), ("dixon", "dicksonx"),
        ("jellyfish", "smellyfish"), ("abcde", "abdce"), ("abc", "cba"),
        ("university of oxford", "univ oxford"), ("aa", "aa"),
        ("dwayne", "duane"), ("abcdef", "badcfe"),
    ],
)
def test_jaro_winkler_bit_equal(a, b):
    assert golden._g_jaro_winkler(a, b) == jaro_winkler(a, b)


def test_jaro_winkler_random_bit_equal():
    rng = random.Random(7)
    for _ in range(300):
        a = "".join(rng.choice("abcdef ") for _ in range(rng.randint(0, 12)))
        b = "".join(rng.choice("abcdef ") for _ in range(rng.randint(0, 12)))
        assert golden._g_jaro_winkler(a, b) == jaro_winkler(a, b), (a, b)


_C1_CASES = [
    "[Smith, J.; Lee, K.] Univ Oxford, Dept Phys, Oxford OX1 2JD, England",
    "Harvard Univ, Cambridge, MA 02138, USA",
    "Dept Comp Sci, Tech Univ Munich, D-80333 Munich, Germany",
    "[Garcia, M.] CSIC, Inst Quim, Madrid, Spain; CNRS, Paris, France",
    "Some City Council, Anytown, 12345, Peoples R China",
    "No Org Here, Smallville",
    "",
    "[a;b] X Univ, Y; Z Hosp, W, USA",
]


@pytest.mark.parametrize("cell", _C1_CASES)
def test_c1_split_parse_bit_equal(cell):
    assert golden._g_split_c1(cell) == c1.split_c1(cell)
    for addr in c1.split_c1(cell):
        assert golden._g_parse_address(addr) == c1.parse_address(addr)


def test_c1_country_bit_equal():
    toks = ["USA", "u.s.a.", "Peoples R China", "türkiye", "nowhereland",
            "  France ", "ENGLAND", "", None, "Korea Rep."]
    for t in toks:
        assert golden._g_canonical_country(t) == c1.canonical_country(t)
