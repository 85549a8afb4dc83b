#!/usr/bin/env python
"""On-chip shape sweep for the Pallas exact y-drop chunk kernel:
find the lane width W that maximizes the honest band-cells/s rate
(band cells = traceback link bytes actually written, same measure as
the host engine's res.tbp).  Width-overflowed anchors are counted —
a production-valid W must keep them at zero."""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from lastz_tpu.core.scoring import new_dna_score_set
    from lastz_tpu.ops.ydrop_exact import (
        ST_WIDTH_OVERFLOW, fresh_state_np, make_compact_alphabet)
    from lastz_tpu.ops.ydrop_pallas_exact import ydrop_chunk_pallas

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(1)
    alpha_b = np.frombuffer(b"ACGT", dtype=np.uint8)
    sc = new_dna_score_set()
    ge = int(sc.gap_extend)
    goe = int(sc.gap_open + sc.gap_extend)

    def build_args(B, rows, W):
        n = rows + W + 64
        s1 = alpha_b[rng.integers(0, 4, n)]
        s2 = s1.copy()
        mut = rng.random(n) < 0.10
        s2[mut] = alpha_b[rng.integers(0, 4, mut.sum())]
        code_map, subsmall = make_compact_alphabet([s1, s2], sc.sub)
        a_win = np.stack([code_map[s1[o:o + rows]]
                          for o in rng.integers(0, 48, B)]) \
            .astype(np.int32)
        b_win = np.zeros((B, W), np.int32)
        for b, o in enumerate(rng.integers(0, 48, B)):
            b_win[b, 1:] = code_map[s2[o:o + W - 1]]
        Ms = np.full(B, rows - 2, np.int64)
        Ns = np.full(B, W - 8, np.int64)
        st_np, _ = fresh_state_np(Ns, ge, goe, 9400, W, B)
        state = {k: jnp.asarray(v) for k, v in st_np.items()}
        args = (jnp.asarray(a_win), jnp.asarray(b_win),
                jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32),
                jnp.asarray(Ms, dtype=jnp.int32),
                jnp.asarray(Ns, dtype=jnp.int32), state,
                jnp.asarray(subsmall))
        kw = dict(gap_e=ge, gap_oe=goe, y_drop=9400, lanes=W,
                  rows=rows, alpha=subsmall.shape[0],
                  trim_to_peak=True, tb_cap=80 << 20)
        return args, kw

    rows = 512
    out = []
    shapes = [int(w) for w in os.environ.get(
        "SWEEP_WS", "1536,1024,896,768,640").split(",")]
    G = int(os.environ.get("SWEEP_G", "8"))
    for W in shapes:
        B = 4096  # grid of B/G groups swamps tunnel dispatch RTT
        args, kw = build_args(B, rows, W)
        tbp0 = float(np.asarray(args[6]["tbp"], np.int64).sum())
        st, tb = ydrop_chunk_pallas(*args, G=G, **kw)
        jax.block_until_ready(tb)
        st = tb = None
        t0 = time.time()
        st, tb = ydrop_chunk_pallas(*args, G=G, **kw)
        jax.block_until_ready(tb)
        dt = time.time() - t0
        rows_done = float(np.asarray(st["rows_used"]).sum())
        band = float(np.asarray(st["tbp"], np.int64).sum()) - tbp0
        n_ovf = int((np.asarray(st["status"])
                     & ST_WIDTH_OVERFLOW != 0).sum())
        rec = {"W": W, "G": G, "rows": rows, "B": B,
               "seconds": round(dt, 3),
               "band_cells": band,
               "band_gcells_per_sec": round(band / dt / 1e9, 3),
               "lane_gcells_per_sec": round(
                   rows_done * W / dt / 1e9, 3),
               "occupancy": round(band / (rows_done * W), 3),
               "width_overflows": n_ovf}
        print(json.dumps(rec), flush=True)
        out.append(rec)
    with open("/tmp/sweep_w.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
