"""Subprocess harness for the SIMD property tests.

Runs N randomized ydrop_sweep cases at the ctypes level and prints one
sha256 digest over every observable output (score/ends/truncation,
edit-script ops, raw traceback bytes).  The parent test runs this
under three env configs — scalar (LASTZ_TPU_NO_AVX_ROW=1), AVX2
(LASTZ_TPU_NO_AVX512_ROW=1) and AVX-512 (default) — and asserts the
digests are identical.  A subprocess per config is required because
row_avx_enabled() caches the env on first use
(native/ydrop_row.cpp:968-981).

The case generator deliberately sweeps the inputs the two fixed seeds
of test_simd_paths.py never vary: gap_e/gap_oe, y_drop (narrow band /
default / huge band), trim_to_peak, reversed scans, masked lowercase
runs, N and junk bytes, unrelated sequence, tiny M/N, and a starved
traceback arena (truncation path).
"""

import ctypes
import hashlib
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

JUNK = np.frombuffer(b"NRYacgtnx*", dtype=np.uint8)
ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)


def gen_case(idx: int):
    rng = np.random.default_rng(1000 + idx)
    La = int(rng.integers(30, 600))
    Lb = int(rng.integers(30, 600))
    if rng.random() < 0.15:        # band-edge: very lopsided
        Lb = int(rng.integers(8, 40))
    s1 = ALPHA[rng.integers(0, 4, La)]
    if rng.random() < 0.7:
        # related pair: mutate a copy so extension runs deep
        s2 = s1[:Lb].copy() if Lb <= La else np.concatenate(
            [s1, ALPHA[rng.integers(0, 4, Lb - La)]])
        mut = rng.random(Lb) < rng.uniform(0.03, 0.3)
        s2[mut] = ALPHA[rng.integers(0, 4, int(mut.sum()))]
    else:
        s2 = ALPHA[rng.integers(0, 4, Lb)]
    # sprinkle masked/ambiguous/junk bytes
    for s in (s1, s2):
        j = rng.random(len(s)) < 0.06
        s[j] = JUNK[rng.integers(0, len(JUNK), int(j.sum()))]
        if rng.random() < 0.3:     # a solid lowercase (masked) run
            a = int(rng.integers(0, max(1, len(s) - 10)))
            w = int(rng.integers(4, 30))
            s[a:a + w] |= 0x20
    gap_e = int(rng.integers(1, 61))
    gap_oe = gap_e + int(rng.integers(0, 501))
    y_drop = int(rng.choice([rng.integers(20, 500),
                             rng.integers(500, 30000),
                             rng.integers(30000, 100000)]))
    trim = int(rng.random() < 0.8)
    rev = rng.random() < 0.3
    tb_cap = 256 if rng.random() < 0.1 else (1 << 20)
    return s1, s2, gap_e, gap_oe, y_drop, trim, rev, tb_cap


def run_case(lib, sub, res, case):
    s1, s2, gap_e, gap_oe, y_drop, trim, rev, tb_cap = case
    i64 = ctypes.c_int64
    p_i64 = ctypes.POINTER(ctypes.c_int64)
    p_u8 = ctypes.POINTER(ctypes.c_uint8)
    M = len(s1) - 2
    N = len(s2) - 2
    if rev:
        a_origin, a_step = len(s1) - 1, -1
        b_origin, b_step = len(s2) - 1, -1
    else:
        a_origin, a_step = 0, 1
        b_origin, b_step = 0, 1
    tb = np.zeros(tb_cap, np.uint8)
    ops = np.zeros(2 * (M + N) + 16, np.uint8)
    z = np.zeros(4, np.int64)
    lib.ydrop_sweep(
        s1.ctypes.data_as(p_u8), s2.ctypes.data_as(p_u8),
        sub.ctypes.data_as(p_i64),
        i64(a_origin), i64(a_step), i64(b_origin), i64(b_step),
        i64(M), i64(N),
        i64(gap_e), i64(gap_oe), i64(y_drop),
        i64(y_drop // gap_e + 6),
        i64(-(1 << 40)), i64(trim),
        z.ctypes.data_as(p_i64), i64(0),
        z.ctypes.data_as(p_i64), i64(0),
        z.ctypes.data_as(p_i64), z.ctypes.data_as(p_i64),
        z.ctypes.data_as(p_i64), i64(0), z.ctypes.data_as(p_i64),
        tb.ctypes.data_as(p_u8), i64(tb_cap),
        ops.ctypes.data_as(p_u8), ctypes.byref(res))
    h = hashlib.sha256()
    h.update(np.array([res.score, res.end1, res.end2, res.truncated,
                       res.n_ops, res.tbp], np.int64).tobytes())
    h.update(ops[:res.n_ops].tobytes())
    h.update(tb[:min(res.tbp, tb_cap)].tobytes())
    return h.hexdigest()


def main():
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    from lastz_tpu.core.scoring import new_dna_score_set
    from lastz_tpu.native import SweepResult, get_lib
    lib = get_lib()
    if lib is None:
        print("NOLIB")
        return
    sc = new_dna_score_set()
    sub = np.ascontiguousarray(sc.sub, np.int64)
    res = SweepResult()
    h = hashlib.sha256()
    for idx in range(n_cases):
        h.update(run_case(lib, sub, res, gen_case(idx)).encode())
    print(h.hexdigest())


if __name__ == "__main__":
    main()
