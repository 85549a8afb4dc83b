"""The Pallas exact y-drop chunk kernel must match ydrop_chunk (the
XLA exact kernel, itself golden-tested against the host engine)
state-for-state and traceback-byte-for-byte, including across
multi-chunk resumes with window re-anchoring."""

import numpy as np
import jax.numpy as jnp
import pytest

from lastz_tpu.core.scoring import new_dna_score_set
from lastz_tpu.ops.ydrop_exact import (fresh_state_np,
                                       make_compact_alphabet,
                                       ydrop_chunk)
from lastz_tpu.ops.ydrop_pallas_exact import ydrop_chunk_pallas


def _mk_pair(rng, n, div):
    alpha = np.frombuffer(b"ACGT", np.uint8)
    s1 = alpha[rng.integers(0, 4, n)]
    s2 = s1.copy()
    mut = rng.random(n) < div
    s2[mut] = alpha[rng.integers(0, 4, mut.sum())]
    return s1, s2


def _run_both(B, rows, W, y_drop, div, trim_to_peak=True,
              tb_cap=1 << 20, chunks=1, seed=0):
    rng = np.random.default_rng(seed)
    n = rows * (chunks + 1) + W + 64
    sc = new_dna_score_set()
    ge = int(sc.gap_extend)
    goe = int(sc.gap_open + sc.gap_extend)
    s1, s2 = _mk_pair(rng, n, div)
    code_map, subsmall = make_compact_alphabet([s1, s2], sc.sub)
    a_full = np.stack([code_map[s1[o:o + rows * chunks + 8]]
                       for o in rng.integers(0, 32, B)])
    b_full = np.stack([code_map[s2[o:o + rows * chunks + W + 8]]
                       for o in rng.integers(0, 32, B)])
    Ms = np.full(B, a_full.shape[1] - 2, np.int64)
    Ns = np.full(B, b_full.shape[1] - 2, np.int64)
    kw = dict(gap_e=ge, gap_oe=goe, y_drop=y_drop, lanes=W,
              rows=rows, alpha=subsmall.shape[0],
              trim_to_peak=trim_to_peak, tb_cap=tb_cap)

    st_np, _ = fresh_state_np(Ns, ge, goe, y_drop, W, B)
    states = [
        {k: jnp.asarray(v) for k, v in st_np.items()},
        {k: jnp.asarray(v) for k, v in st_np.items()},
    ]
    prev_off = np.zeros(B, np.int64)
    for chunk in range(chunks):
        outs = []
        # identical host-side windowing for both kernels, derived
        # from kernel 0's state (asserted equal each round anyway)
        done = np.asarray(states[0]["done"])
        row_base = np.asarray(states[0]["row"]).astype(np.int64) - 1
        b_off = np.where(done, prev_off,
                         np.asarray(states[0]["LY"]).astype(np.int64))
        shift = (b_off - prev_off).astype(np.int32)
        prev_off = b_off.copy()
        a_win = np.zeros((B, rows), np.int32)
        b_win = np.zeros((B, W), np.int32)
        for b in range(B):
            lo = int(row_base[b])
            src = a_full[b, lo: lo + rows]
            a_win[b, : len(src)] = src
            lo2 = int(b_off[b])
            if lo2 == 0:
                src = b_full[b, : W - 1]
                b_win[b, 1: 1 + len(src)] = src
            else:
                src = b_full[b, lo2 - 1: lo2 - 1 + W]
                b_win[b, : len(src)] = src
        args = (jnp.asarray(a_win), jnp.asarray(b_win),
                jnp.asarray(b_off.astype(np.int32)),
                jnp.asarray(shift),
                jnp.asarray(Ms, dtype=jnp.int32),
                jnp.asarray(Ns, dtype=jnp.int32))
        st0, tb0 = ydrop_chunk(*args, states[0],
                               jnp.asarray(subsmall), **kw)
        st1, tb1 = ydrop_chunk_pallas(*args, states[1],
                                      jnp.asarray(subsmall),
                                      G=min(8, B), interpret=True,
                                      **kw)
        states = [st0, st1]
        for k in st0:
            assert np.array_equal(np.asarray(st0[k]),
                                  np.asarray(st1[k])), \
                f"state[{k}] differs in chunk {chunk}"
        assert np.array_equal(np.asarray(tb0), np.asarray(tb1)), \
            f"tb differs in chunk {chunk}"
        if np.asarray(st0["done"]).all():
            break


def test_basic_chunk():
    _run_both(B=8, rows=96, W=256, y_drop=3000, div=0.12, seed=1)


def test_multi_chunk_resume():
    _run_both(B=8, rows=64, W=384, y_drop=4000, div=0.08, chunks=3,
              seed=2)


def test_boundary_mode():
    _run_both(B=8, rows=80, W=256, y_drop=3000, div=0.10,
              trim_to_peak=False, seed=3)


def test_truncation():
    _run_both(B=8, rows=96, W=256, y_drop=3000, div=0.10,
              tb_cap=600, seed=4)


def test_high_divergence_dies_early():
    _run_both(B=8, rows=96, W=256, y_drop=900, div=0.45, seed=5)
