"""Chain DP: native k-d tree path vs numpy fallback equivalence
(reference chain.c:224,647,920), plus a scale smoke test."""

import time

import numpy as np
import pytest

from lastz_tpu.align import chain as chain_mod
from lastz_tpu.align.segments import SegmentTable
from lastz_tpu.core.scoring import new_dna_score_set


def _random_table(rng, n, span=100000):
    st = SegmentTable()
    pos1 = rng.integers(0, span, n)
    pos2 = rng.integers(0, span, n)
    length = rng.integers(10, 200, n)
    score = rng.integers(1000, 9000, n)
    for k in range(n):
        st.add(int(pos1[k]), int(pos2[k]), int(length[k]), int(score[k]), 0)
    return st


def _run_chain(st, use_native):
    scoring = new_dna_score_set()
    if use_native:
        from lastz_tpu.native import get_lib
        if get_lib() is None:
            pytest.skip("no native library")
        best = chain_mod.reduce_to_chain(st, 500, 50, scoring)
    else:
        import unittest.mock as mock
        with mock.patch("lastz_tpu.native.get_lib", return_value=None):
            best = chain_mod.reduce_to_chain(st, 500, 50, scoring)
    kept = [(s.pos1, s.pos2, s.length, s.score) for s in st.segments]
    return best, kept


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("n", [5, 60, 400])
def test_native_matches_numpy(seed, n):
    rng = np.random.default_rng(seed)
    pos = rng.integers(0, 50000, (n, 2))
    length = rng.integers(10, 200, n)
    score = rng.integers(1000, 9000, n)

    def build():
        st = SegmentTable()
        for k in range(n):
            st.add(int(pos[k, 0]), int(pos[k, 1]), int(length[k]),
                   int(score[k]), 0)
        return st

    st_native = build()
    st_numpy = build()
    best_native, kept_native = _run_chain(st_native, True)
    best_numpy, kept_numpy = _run_chain(st_numpy, False)
    assert best_native == best_numpy
    assert kept_native == kept_numpy


def test_chain_scales_to_1e5():
    """VERDICT item 6: large chains must complete fast (k-d tree, not
    the quadratic DP)."""
    from lastz_tpu.native import get_lib
    if get_lib() is None:
        pytest.skip("no native library")
    rng = np.random.default_rng(42)
    n = 100_000
    # mostly-diagonal segments (chainable) plus background noise
    st = SegmentTable()
    base = np.sort(rng.integers(0, 50_000_000, n))
    pos2 = base + rng.integers(-2000, 2000, n)
    length = rng.integers(20, 200, n)
    score = rng.integers(3000, 9000, n)
    for k in range(n):
        st.add(int(base[k]), int(max(pos2[k], 0)), int(length[k]),
               int(score[k]), 0)
    scoring = new_dna_score_set()
    t0 = time.time()
    best = chain_mod.reduce_to_chain(st, 500, 50, scoring)
    elapsed = time.time() - t0
    assert best > 0
    assert len(st.segments) > 10
    assert elapsed < 20.0
