"""Kernel-level randomized property tests for the SIMD host paths
(VERDICT r3, weak item 6): hundreds of randomized draws over gap
params, y-drop values, masked runs, junk bytes and band edges,
compared against the scalar recurrences at the ctypes-call level.

Two kernels are covered:

* the 16-wide x-drop block (native/ydrop_row.cpp xdrop_scan_core,
  engaged by lib.xdrop_extend) vs a pure-Python transcription of the
  scalar recurrence it documents (reference seed_search.c:2528);
* the AVX-512/AVX2 two-pass exact row kernels (row32_main_avx512 /
  row32_main_avx) vs the scalar row loop, via full ydrop_sweep calls
  under the three LASTZ_TPU_NO_AVX*_ROW configs — subprocesses,
  because the dispatch caches the env on first use.
"""

import ctypes
import os
import subprocess
import sys

import numpy as np
import pytest

from lastz_tpu.core.scoring import new_dna_score_set
from lastz_tpu.native import get_lib

HERE = os.path.dirname(os.path.abspath(__file__))
HARNESS = os.path.join(HERE, "simd_prop_harness.py")

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native lib unavailable")


def _xdrop_scalar(s1, s2, p1, p2, n, step, x_drop):
    """The documented scalar contract of xdrop_scan_core
    (native/ydrop_row.cpp:287-292; reference seed_search.c:2528)."""
    run = best = 0
    kbest = -1
    cons = n
    for k in range(n):
        run += int(_SUB[int(s1[p1 + step * k]), int(s2[p2 + step * k])])
        if run > best:
            best = run
            kbest = k
        if run < best - x_drop:
            cons = k + 1
            break
    return cons, best, kbest


_SUB = None


def _gen_seq(rng, n):
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    junk = np.frombuffer(b"NRYacgtnx", dtype=np.uint8)
    s = alpha[rng.integers(0, 4, n)]
    j = rng.random(n) < 0.05
    s[j] = junk[rng.integers(0, len(junk), int(j.sum()))]
    return s


def test_xdrop_extend_simd_vs_scalar_randomized():
    """>=300 randomized draws through lib.xdrop_extend (SIMD LUT
    path + scalar tail) vs the pure-Python recurrence."""
    global _SUB
    lib = get_lib()
    sc = new_dna_score_set()
    base_sub = np.ascontiguousarray(sc.sub, np.int64)
    i64 = ctypes.c_int64
    p_i64 = ctypes.POINTER(ctypes.c_int64)
    p_u8 = ctypes.POINTER(ctypes.c_uint8)
    outs = [np.zeros(1, np.int64) for _ in range(5)]

    for idx in range(300):
        rng = np.random.default_rng(5000 + idx)
        n = int(rng.integers(20, 400))
        s1 = _gen_seq(rng, n)
        if rng.random() < 0.75:
            s2 = s1.copy()
            mut = rng.random(n) < rng.uniform(0.02, 0.35)
            s2[mut] = _gen_seq(rng, int(mut.sum()))
        else:
            s2 = _gen_seq(rng, n)
        # same diagonal keeps both scans in-bounds for any stop pair
        pos1 = int(rng.integers(1, n))
        pos2 = pos1
        stop_left = int(rng.integers(0, pos1 + 1))
        stop_right = int(rng.integers(pos1, n + 1))
        # sweep x_drop across LUT-enabled and LUT-disabled regimes
        x_drop = int(rng.choice([rng.integers(1, 200),
                                 rng.integers(200, 28000),
                                 rng.integers(28001, 60000)]))
        sub = base_sub
        if rng.random() < 0.1:
            # scores outside int8 must disable the LUT, not corrupt it
            sub = base_sub * 3

        _SUB = sub
        lib.xdrop_extend(
            s1.ctypes.data_as(p_u8), s2.ctypes.data_as(p_u8),
            sub.ctypes.data_as(p_i64),
            i64(pos1), i64(pos2), i64(stop_left), i64(stop_right),
            i64(x_drop),
            *[o.ctypes.data_as(p_i64) for o in outs])

        nl = pos1 - stop_left
        cons, best, kb = _xdrop_scalar(
            s1, s2, pos1 - 1, pos2 - 1, max(nl, 0), -1, x_drop)
        want_left_start = pos1 - 1 - kb if kb >= 0 else pos1
        want_left_score = best
        nr = stop_right - pos1
        cons, best, kb = _xdrop_scalar(
            s1, s2, pos1, pos2, max(nr, 0), +1, x_drop)
        want = (want_left_start, want_left_score,
                pos1 + kb + 1 if kb >= 0 else pos1, best,
                pos1 + cons)
        got = tuple(int(o[0]) for o in outs)
        assert got == want, (
            f"case {idx}: xdrop_extend mismatch got={got} want={want} "
            f"(pos1={pos1} x_drop={x_drop} n={n})")


def _harness_digest(env_extra, n_cases=250):
    env = dict(os.environ)
    env.pop("LASTZ_TPU_NO_AVX_ROW", None)
    env.pop("LASTZ_TPU_NO_AVX512_ROW", None)
    env.update(env_extra)
    r = subprocess.run(
        [sys.executable, HARNESS, str(n_cases)],
        capture_output=True, text=True, env=env, timeout=560,
        cwd=os.path.dirname(HERE))
    assert r.returncode == 0, r.stderr[-2000:]
    digest = r.stdout.strip().splitlines()[-1]
    assert digest and digest != "NOLIB", "harness produced no digest"
    return digest


def test_ydrop_row_simd_vs_scalar_randomized():
    """250 randomized full sweeps: scalar, AVX2 and AVX-512 row
    kernels must produce identical scores, ends, edit scripts and
    traceback bytes."""
    scalar = _harness_digest({"LASTZ_TPU_NO_AVX_ROW": "1"})
    avx2 = _harness_digest({"LASTZ_TPU_NO_AVX512_ROW": "1"})
    assert avx2 == scalar, "AVX2 row kernel diverges from scalar rows"
    avx512 = _harness_digest({})
    assert avx512 == scalar, \
        "AVX-512 row kernel diverges from scalar rows"
