#!/usr/bin/env python
"""Standalone Mosaic-compile/correctness harness for the x-drop scan
kernel (ops/xdrop_pallas.py) on the real TPU: tiny inputs, compares
against the XLA wave continuation run from scratch."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.pop("JAX_PLATFORMS", None)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from lastz_tpu.ops import hitgen as hg
    from lastz_tpu.ops.xdrop_pallas import NB, xdrop_scan_pallas

    print("backend", jax.default_backend(), flush=True)
    rng = np.random.default_rng(5)
    n = 30000
    alpha = np.arange(4, dtype=np.int8)
    codes1 = rng.integers(1, 5, n).astype(np.int8)
    codes2 = codes1.copy()
    mut = rng.random(n) < 0.12
    codes2[mut] = rng.integers(1, 5, mut.sum()).astype(np.int8)

    # padded flat + rows32 layouts (device_hits._seq_device shape)
    SEQ_PAD = hg.SEQ_PAD
    def pad_flat(c):
        host = np.zeros(len(c) + 2 * SEQ_PAD, np.int8)
        host[SEQ_PAD:SEQ_PAD + len(c)] = c
        return jnp.asarray(host)
    def rows32(flat):
        m = int(flat.shape[0])
        R = (m + 127) // 128
        pad = R * 128 - m
        a = flat
        if pad:
            a = jnp.concatenate([a, jnp.zeros(pad, jnp.int8)])
        return a.astype(jnp.int32).reshape(R, 128)

    seq1p = pad_flat(codes1)
    seq2p = pad_flat(codes2)
    seq1_rows = rows32(seq1p)
    seq2_rows = rows32(seq2p)

    K = 5
    sub = np.full((K, K), -114, np.int64)
    np.fill_diagonal(sub, 91)
    sub[0, :] = sub[:, 0] = -(10 ** 8)
    subflat = jnp.asarray(sub.reshape(-1).astype(np.int64))
    sub_tuple = tuple(int(v) for v in sub.reshape(-1))

    H = NB  # one block
    p1 = rng.integers(100, n - 100, H).astype(np.int32)
    p2 = (p1 + rng.integers(-50, 50, H)).clip(100, n - 100).astype(np.int32)
    diag = p1 - p2
    n_l = (p1 - np.maximum(diag, 0)).astype(np.int32)
    stop1r = np.minimum(n, n + diag)
    n_r = np.maximum(stop1r - p1, 0).astype(np.int32)
    p1j, p2j = jnp.asarray(p1), jnp.asarray(p2)
    nlj, nrj = jnp.asarray(n_l), jnp.asarray(n_r)

    x_drop = 910
    t0 = time.time()
    left_k, right_k = hg._xdrop_both_pallas(
        seq1_rows, seq2_rows, jnp.int32(SEQ_PAD), seq1p, seq2p,
        subflat, sub_tuple, K, p1j, p2j, nlj, nrj, x_drop,
        interpret=False)
    jax.block_until_ready(right_k)
    print("pallas path ok, %.1fs" % (time.time() - t0), flush=True)

    right = hg._xdrop_all(seq1p, seq2p, subflat, K, p1j, p2j, nrj,
                          x_drop, +1)
    left = hg._xdrop_all(seq1p, seq2p, subflat, K, p1j - 1, p2j - 1,
                         nlj, x_drop, -1)
    for name, a, b in (("right", right, right_k),
                       ("left", left, left_k)):
        for i, (x, y) in enumerate(zip(a, b)):
            same = np.array_equal(np.asarray(x), np.asarray(y))
            print(f"{name}[{i}] equal={same}", flush=True)
            if not same:
                xa, ya = np.asarray(x), np.asarray(y)
                bad = np.nonzero(xa != ya)[0][:5]
                print("   first diffs at", bad, xa[bad], ya[bad])
                return 1
    print("ALL EQUAL", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
