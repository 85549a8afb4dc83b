#!/usr/bin/env python
"""Fault isolation for the device hitgen worker crash: run one
sub-program of ops/hitgen.py per invocation on the real TPU.

Usage: python tpu_diag_hitgen.py {xdrop_all,resolve,launch_noext,launch_xla,launch_pallas,waves}
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
os.environ.pop("JAX_PLATFORMS", None)

import numpy as np


def main(mode):
    import jax
    import jax.numpy as jnp
    from lastz_tpu.ops import hitgen as hg

    print("platform", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    N = 60000
    seq = rng.integers(0, 4, N + 2 * hg.SEQ_PAD).astype(np.int8)
    seq1p = jnp.asarray(seq)
    seq2p = jnp.asarray(seq)
    subflat = jnp.asarray(np.array(
        [91, -114, -31, -123,
         -114, 100, -125, -31,
         -31, -125, 100, -114,
         -123, -31, -114, 91], np.int32))
    K = 4
    H = 1 << 15
    p1 = jnp.asarray(rng.integers(100, N - 100, H).astype(np.int32))
    p2 = jnp.asarray(rng.integers(100, N - 100, H).astype(np.int32))
    n = jnp.asarray(rng.integers(0, 2000, H).astype(np.int32))
    t0 = time.time()

    if mode == "xdrop_all":
        c, b, k = hg._xdrop_all(seq1p, seq2p, subflat, K, p1, p2, n,
                                910, +1)
        jax.block_until_ready(c)
        print("xdrop_all ok", np.asarray(b)[:4], flush=True)
    elif mode == "waves":
        z = jnp.zeros((H,), jnp.int32)
        state = (z, z, z, z, jnp.full((H,), -1, jnp.int32), z, n > 0)
        c, b, k = hg._xdrop_waves(seq1p, seq2p, subflat, K, p1, p2, n,
                                  910, +1, state)
        jax.block_until_ready(c)
        print("waves ok", np.asarray(b)[:4], flush=True)
    elif mode == "resolve":
        extent = jnp.asarray(rng.integers(0, N, H).astype(np.int32))
        pos2mL = jnp.asarray(rng.integers(0, N, H).astype(np.int32))
        de0 = jnp.zeros((H,), jnp.int32)
        seg = jnp.asarray(rng.random(H) < 0.01)
        seg = seg.at[0].set(True)
        live = jnp.ones((H,), bool)
        a, d, cv = hg._resolve_chains_dev(extent, pos2mL, de0, seg,
                                          live)
        jax.block_until_ready(a)
        print("resolve ok conv=", bool(cv), flush=True)
    elif mode.startswith("launch"):
        # realistic CSR: random word -> positions; "13" suffix uses
        # the hitgen_validate stage's real geometry (nprobe=13 probe
        # set, 2^24-word table, K=16 padded score stride, H=65536)
        stage_geom = mode.endswith("13")
        NW = (1 << 24) if stage_geom else (1 << 20)
        nprobe = 13 if stage_geom else 1
        csr_start = np.sort(
            rng.integers(0, 60000, NW + 1).astype(np.int32)) \
            if stage_geom else np.sort(
            rng.integers(0, 200000, NW + 1).astype(np.int32))
        csr_start[0] = 0
        npos = int(csr_start[-1])
        csr_pos = jnp.asarray(
            rng.integers(0, (N - 64), npos).astype(np.int32))
        csr_start_d = jnp.asarray(csr_start)
        P = 1 << 16 if stage_geom else 1 << 14
        packed = jnp.asarray(rng.integers(
            0, NW, P).astype(np.uint32))
        valid = jnp.ones((P,), bool)
        xors = jnp.asarray(
            rng.integers(0, NW, nprobe).astype(np.uint32)
            if stage_geom else np.array([0], np.uint32))
        if stage_geom:
            global_K = 16
            sub16 = np.zeros((16, 16), np.int64)
            sub16[:5, :5] = np.array(
                [[-(10 ** 8)] * 5] + [[-(10 ** 8)] + r for r in
                 [[91, -114, -31, -123], [-114, 100, -125, -31],
                  [-31, -125, 100, -114], [-123, -31, -114, 91]]],
                np.int64)
            globals()["_SUBFLAT16"] = jnp.asarray(sub16.reshape(-1))
        cum, ends, tot = hg.pair_counts(packed, valid, xors,
                                        csr_start_d)
        total = int(tot)
        print("total candidates", total, flush=True)
        if stage_geom:
            H = 1 << 16
            out_cap = 8192
            subflat = globals()["_SUBFLAT16"]
            K = 16
        else:
            out_cap = 4096
        karr = hg.expand_chunk(cum, ((int(tot) // H) + 2) * H)
        total = int(tot)
        de = jnp.full((65536,), -1, jnp.int32)
        da = jnp.zeros((65536,), jnp.int32)
        kw = dict(no_extend=(mode == "launch_noext"),
                  self_compare=False, same_strand=True,
                  use_thresh=True, has_alive=False, K=K,
                  nprobe=nprobe, x_drop=910,
                  H=H, out_cap=out_cap)
        args = [seq1p, seq2p, subflat, csr_pos,
                jnp.zeros(1, jnp.uint8),
                cum, ends, karr[:H], de, da,
                jnp.int32(0), jnp.int32(min(total, H)), jnp.int32(0),
                jnp.int32(0), jnp.int32(1), jnp.int32(19),
                jnp.int32(3000), jnp.int32(1 << 30),
                jnp.int32(N), jnp.int32(N)]
        if mode == "launch_pallas":
            R = (N + 2 * hg.SEQ_PAD) // 128
            rows = seq1p[:R * 128].astype(jnp.int32).reshape(R, 128)
            kw.update(sub_tuple=tuple(int(v) for v in
                                      np.asarray(subflat)),
                      pallas_interpret=False)
            args += [rows, rows, jnp.int32(hg.SEQ_PAD)]
        de2, da2, out, sc = hg.hit_launch(*args, **kw)
        print(mode, "ok scalars", np.asarray(sc), flush=True)
    else:
        raise SystemExit(f"unknown mode {mode}")
    print("dt %.1fs" % (time.time() - t0), flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
