"""Pallas TPU port of the EXACT y-drop chunk kernel (with traceback).

Same contract as ops/ydrop_exact._chunk_one (reference row sweep:
gapped_extend.c:3388-3860): resumable per-anchor state, per-row
traceback link bytes, identical scores/ends/status — but the whole
`rows`-row chunk runs inside ONE Pallas kernel with VMEM-resident
CC/DD/state, instead of an XLA scan that round-trips every row's
intermediates through fusion boundaries.

Layout: G anchors ride the SUBLANE dimension, the DP window rides the
LANE dimension — every row is (G, W) elementwise VPU work plus
log-shift prefix scans (static-shift concats).  The row recurrence
uses the same two-pass exact scheme as ydrop_exact.py: pass 1's
reset-free decayed chain resolves prune/branch/best decisions
exactly; pass 2's single reset-scan recovers exact I values for the
link bytes.

Substitution scores: the per-row 16-score slices subsmall[a_code] are
pre-gathered XLA-side into (G, rows, 128)-padded planes so the kernel
only does a dynamic row load plus an alpha-wide select chain (TPU
vector gathers over small tables are not supported by Mosaic).

Correctness is asserted against ydrop_exact.ydrop_chunk in
tests/test_ydrop_pallas_exact.py (interpret mode on CPU) and the
kernel is only trusted on TPU after the same validation runs there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .ydrop_exact import (C_FROM_C, C_FROM_D, C_FROM_I, D_EXTEND,
                          I_EXTEND, ISENT, NEG, SENT32,
                          ST_TRUNCATED, ST_WIDTH_OVERFLOW)

# scalar-state slot layout in the (G, 128) int32 scalars block
_S = ("LY", "RY", "row", "best", "end1", "end2", "bscore", "bflag",
      "tbp", "rows_used", "maxRY", "status", "done", "stop",
      "b_off", "M", "N")
_SIDX = {k: i for i, k in enumerate(_S)}
NSPAD = 128

BIG = np.int32(1 << 30)


def _shift_right_lanes(x, n, fill):
    """x shifted right by n along the lane axis, filling with fill
    (static slice + concat: the one shift form Mosaic always takes)."""
    G = x.shape[0]
    pad = jnp.full((G, n), fill, x.dtype)
    return jnp.concatenate([pad, x[:, :-n]], axis=1)


def _prefix_max(x, fill, W):
    shift = 1
    while shift < W:
        x = jnp.maximum(x, _shift_right_lanes(x, shift, fill))
        shift *= 2
    return x


def _prefix_max_reset(s, r, W):
    """Inclusive scan of (s1,r1)x(s2,r2) = (s2 if r2 else max(s1,s2),
    r1|r2), log-shift form."""
    shift = 1
    while shift < W:
        s_sh = _shift_right_lanes(s, shift, ISENT)
        r_sh = _shift_right_lanes(r.astype(jnp.int32), shift, 0)
        s = jnp.where(r, s, jnp.maximum(s_sh, s))
        r = r | (r_sh != 0)
        shift *= 2
    return s


def _kernel(a_ref, b_ref, srow_ref, cc_ref, dd_ref, sc_ref,
            cc_out, dd_out, sc_out, tb_ref,
            *, G: int, W: int, rows: int, alpha: int,
            gap_e: int, gap_oe: int, y_drop: int,
            trim_to_peak: bool, tb_cap: int, y_drop_tail: int):
    import jax.experimental.pallas as pl

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (G, W), 1)
    sc_in = sc_ref[0]                  # (G, NSPAD) int32

    def col(name):
        return sc_in[:, _SIDX[name]][:, None]  # (G, 1) int32

    b_small = b_ref[0]                 # (G, W) int32
    b_off = col("b_off")
    M = col("M")
    N = col("N")

    # row 0 of the tb block is host-synthesized (fresh_state row0
    # links); zero it here so the buffer is fully defined.  The tb
    # block is laid out (1, rows+1, G, W) — row on a LEADING
    # (untiled) axis — because Mosaic cannot lower a dynamic-index
    # int8 store into the tiled sublane axis (the transpose back to
    # (G, rows+1, W) happens XLA-side after the kernel).
    tb_ref[0, 0] = jnp.zeros((G, W), jnp.uint8)

    def body(r, carry):
        (CC, DD, LY, RY, row, best, end1, end2, bscore, bflag, tbp,
         rows_used, maxRY, status, done, stop) = carry
        stopped = stop != 0

        tb_needed = jnp.maximum(RY - LY, 0) + y_drop_tail
        trunc = ~stopped & (tbp + tb_needed >= tb_cap)

        # substitution scores: dynamic row slice + alpha select chain
        # (row is the leading/untiled axis of the srow block so the
        # dynamic-index load lowers on Mosaic)
        srow = srow_ref[0, pl.ds(r, 1)][0]              # (G, 128)
        s_vals = jnp.zeros((G, W), jnp.int32)
        for c in range(alpha):
            s_vals = jnp.where(b_small == c, srow[:, c][:, None],
                               s_vals)

        LYr = LY - b_off
        RYr = RY - b_off
        active = (col_iota >= LYr) & (col_iota < RYr)
        d = jnp.where(active, DD, NEG)
        c_sub = _shift_right_lanes(CC, 1, NEG) + s_vals
        c_sub = jnp.where(active & (col_iota > LYr), c_sub, NEG)

        # pass 1: reset-free decayed chain -> exact decisions
        left_dead = col_iota < LYr
        comp = (col_iota + 1) * gap_e
        elem_ff = jnp.where(active & (d <= c_sub),
                            c_sub - gap_oe + comp, ISENT)
        s_ff = _shift_right_lanes(
            _prefix_max(elem_ff, ISENT, W), 1, ISENT)
        i_ff = jnp.maximum(s_ff - col_iota * gap_e, NEG)
        gap = active & ((d > c_sub) | (i_ff > c_sub))
        cand = jnp.maximum(jnp.maximum(c_sub, d), i_ff)
        c_best = jnp.where(active & ~gap, c_sub, SENT32)
        pmax_excl = _shift_right_lanes(
            _prefix_max(c_best, SENT32, W), 1, SENT32)
        best_before = jnp.maximum(best, pmax_excl)
        pruned = active & (cand < best_before - y_drop)

        # pass 2: one reset scan -> exact I values for the links
        reset = (pruned & active) | left_dead
        is_seed = active & ~pruned & ~gap
        elem_s = jnp.where(
            reset, NEG + comp,
            jnp.where(is_seed, c_sub - gap_oe + comp, ISENT))
        s_incl = _prefix_max_reset(elem_s, reset, W)
        s_excl = _shift_right_lanes(s_incl, 1, NEG)
        i_vec = s_excl - col_iota * gap_e

        c_val = jnp.where(gap, jnp.maximum(d, i_vec), c_sub)

        c_open = c_sub - gap_oe
        d_dec = d - gap_e
        i_dec = i_vec - gap_e
        link_gap = jnp.where(
            d >= i_vec, np.int32(C_FROM_D | I_EXTEND | D_EXTEND),
            np.int32(C_FROM_I | I_EXTEND | D_EXTEND))
        link_sub = (np.int32(C_FROM_C)
                    | jnp.where(c_open > d_dec, 0, np.int32(D_EXTEND))
                    | jnp.where(c_open > i_dec, 0,
                                np.int32(I_EXTEND)))
        link = jnp.where(pruned | ~active, 0,
                         jnp.where(gap, link_gap, link_sub))

        CC_cur = jnp.where(pruned | ~active, NEG, c_val)
        DD_next = jnp.where(
            pruned | ~active, NEG,
            jnp.where(gap, d_dec, jnp.maximum(c_open, d_dec)))

        # best / end / boundary updates (last-attaining lane wins)
        elig = active & ~pruned & ~gap
        c_e = jnp.where(elig, c_sub, SENT32)
        row_max = jnp.max(c_e, axis=1, keepdims=True)
        fires_best = jnp.any(elig, axis=1, keepdims=True) \
            & (row_max >= best)
        k_best = jnp.max(
            jnp.where(elig & (c_e == row_max), col_iota, -1),
            axis=1, keepdims=True)

        if not trim_to_peak:
            col_abs = b_off + col_iota
            at_b = elig & ((row == M) | (col_abs == N))
            c_b = jnp.where(at_b, c_sub, SENT32)
            b_max = jnp.max(c_b, axis=1, keepdims=True)
            fires_b = jnp.any(at_b, axis=1, keepdims=True) \
                & (b_max >= bscore)
            k_b = jnp.max(
                jnp.where(at_b & (c_b == b_max), col_iota, -1),
                axis=1, keepdims=True)
        else:
            fires_b = jnp.zeros((G, 1), bool)
            b_max = jnp.full((G, 1), SENT32, jnp.int32)
            k_b = jnp.full((G, 1), -1, jnp.int32)

        use_b = fires_b & (~fires_best | (k_b >= k_best))
        use_best = fires_best & ~use_b
        end1 = jnp.where(use_b | use_best, row, end1)
        end2 = jnp.where(use_b, b_off + k_b,
                         jnp.where(use_best, b_off + k_best, end2))
        bflag = jnp.where(use_b, 1, jnp.where(use_best, 0, bflag))
        best = jnp.where(fires_best, row_max, best)
        bscore = jnp.where(fires_b, b_max, bscore)

        notpr = active & ~pruned
        any_live = jnp.any(notpr, axis=1, keepdims=True)
        first_live = jnp.where(
            any_live,
            jnp.min(jnp.where(notpr, col_iota, BIG), axis=1,
                    keepdims=True),
            RYr)
        LY_new = b_off + first_live
        np_k = jnp.max(jnp.where(notpr, col_iota, -1), axis=1,
                       keepdims=True)
        np_col = b_off + np_k

        dead = LY_new >= RY

        K = RY - LY
        i_exit = jnp.max(
            jnp.where(col_iota == jnp.clip(RYr - 1, 0, W - 1),
                      s_incl, -BIG),
            axis=1, keepdims=True) - RYr * gap_e
        shrink = RY > np_col + 1
        thresh = best - y_drop
        if gap_e != 0:
            p_raw = (i_exit - thresh) // gap_e + 1
        else:
            p_raw = jnp.full((G, 1), 1 << 30, jnp.int32)
        p = jnp.where(shrink | (i_exit < thresh), 0,
                      jnp.clip(p_raw, 0, jnp.maximum(N + 1 - RY, 0)))
        RY_shrunk = jnp.where(shrink, np_col + 1, RY + p)
        has_sent = RY_shrunk <= N
        RY_final = RY_shrunk + has_sent.astype(jnp.int32)

        pj = col_iota - RYr
        is_prolong = (pj >= 0) & (pj < p)
        pro_val = i_exit - pj * gap_e
        CC_new = jnp.where(is_prolong, pro_val, CC_cur)
        DD_new = jnp.where(is_prolong, pro_val - gap_oe, DD_next)
        sent_l = RY_shrunk - b_off
        is_sent = has_sent & (col_iota == sent_l)
        CC_new = jnp.where(is_sent, NEG, CC_new)
        DD_new = jnp.where(is_sent, NEG, DD_new)

        tb_row_vec = jnp.where(is_prolong, np.int32(C_FROM_I), link)
        tbp_new = tbp + K + p

        window_end = RY_final - b_off > W
        width_over = (RY_final - LY_new > W) | (K + p > W)
        keep = ~stopped & ~trunc

        status = status | jnp.where(trunc, ST_TRUNCATED, 0)
        status = status | jnp.where(
            keep & width_over & ~dead, ST_WIDTH_OVERFLOW, 0)

        done_new = (done != 0) | trunc | (
            keep & (dead | (row >= M) | width_over))
        stop_new = stopped | done_new | (keep & window_end)

        ys = jnp.where(keep, tb_row_vec, jnp.zeros((G, W), jnp.int32))
        tb_ref[0, pl.ds(r + 1, 1)] = ys.astype(jnp.uint8)[None]

        return (jnp.where(keep, CC_new, CC),
                jnp.where(keep, DD_new, DD),
                jnp.where(keep, LY_new, LY),
                jnp.where(keep, RY_final, RY),
                row + keep.astype(jnp.int32),
                jnp.where(keep, best, carry[5]),
                jnp.where(keep, end1, carry[6]),
                jnp.where(keep, end2, carry[7]),
                jnp.where(keep, bscore, carry[8]),
                jnp.where(keep, bflag, carry[9]),
                jnp.where(keep, tbp_new, tbp),
                jnp.where(keep, row, rows_used),
                jnp.maximum(maxRY, jnp.where(keep, RY_final, 0)),
                status,
                done_new.astype(jnp.int32),
                stop_new.astype(jnp.int32))

    init = (cc_ref[0], dd_ref[0], col("LY"), col("RY"), col("row"),
            col("best"), col("end1"), col("end2"), col("bscore"),
            col("bflag"), col("tbp"), col("rows_used"), col("maxRY"),
            col("status"), col("done"), col("stop"))
    out = jax.lax.fori_loop(0, rows, body, init)
    (CC, DD, LY, RY, row, best, end1, end2, bscore, bflag, tbp,
     rows_used, maxRY, status, done, stop) = out
    cc_out[0] = CC
    dd_out[0] = DD
    scalars = (LY, RY, row, best, end1, end2, bscore, bflag, tbp,
               rows_used, maxRY, status, done, stop,
               col("b_off"), col("M"), col("N"))
    pad = jnp.zeros((G, NSPAD - len(scalars)), jnp.int32)
    sc_out[0] = jnp.concatenate(list(scalars) + [pad], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("gap_e", "gap_oe", "y_drop", "lanes", "rows",
                     "alpha", "trim_to_peak", "tb_cap", "G",
                     "interpret"))
def ydrop_chunk_pallas(a_small, b_small, b_off, shift, M, N, state,
                       subsmall,
                       gap_e: int, gap_oe: int, y_drop: int,
                       lanes: int, rows: int, alpha: int,
                       trim_to_peak: bool, tb_cap: int,
                       G: int = 8, interpret: bool = False):
    """Drop-in for ydrop_exact.ydrop_chunk backed by the Pallas
    kernel.  B (the leading batch dim) must be a multiple of G."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = lanes
    B = a_small.shape[0]
    assert B % G == 0, "batch must be a multiple of the group size"
    NG = B // G

    if gap_e != 0:
        y_drop_tail = int(y_drop) // int(gap_e) + 6
    else:
        y_drop_tail = 500 * 1000

    # window re-anchor (same as _chunk_one, XLA-side)
    padW = jnp.full((B, W), NEG, jnp.int32)
    CC0 = jax.vmap(lambda cc, sh: jax.lax.dynamic_slice(
        cc, (sh,), (W,)))(
        jnp.concatenate([state["CC"], padW], axis=1), shift)
    DD0 = jax.vmap(lambda dd, sh: jax.lax.dynamic_slice(
        dd, (sh,), (W,)))(
        jnp.concatenate([state["DD"], padW], axis=1), shift)

    # per-row substitution slices, gathered XLA-side; lane dim padded
    # to the native 128 so the block is tileable
    sub_pad = jnp.zeros((subsmall.shape[0], 128), jnp.int32)
    sub_pad = jax.lax.dynamic_update_slice(
        sub_pad, subsmall.astype(jnp.int32), (0, 0))
    srow_all = sub_pad[a_small]           # (B, rows, 128) int32

    sc = jnp.stack([
        state["LY"], state["RY"], state["row"], state["best"],
        state["end1"], state["end2"], state["bscore"],
        state["bflag"].astype(jnp.int32), state["tbp"],
        state["rows_used"], state["maxRY"], state["status"],
        state["done"].astype(jnp.int32),
        state["done"].astype(jnp.int32),  # stop := done at entry
        b_off.astype(jnp.int32), M.astype(jnp.int32),
        N.astype(jnp.int32)], axis=1)      # (B, 17)
    sc = jnp.concatenate(
        [sc, jnp.zeros((B, NSPAD - sc.shape[1]), jnp.int32)], axis=1)

    kern = functools.partial(
        _kernel, G=G, W=W, rows=rows, alpha=alpha,
        gap_e=int(gap_e), gap_oe=int(gap_oe), y_drop=int(y_drop),
        trim_to_peak=trim_to_peak, tb_cap=tb_cap,
        y_drop_tail=y_drop_tail)

    vm = pltpu.VMEM
    cc_o, dd_o, sc_o, tb = pl.pallas_call(
        kern,
        grid=(NG,),
        in_specs=[
            pl.BlockSpec((1, G, rows), lambda i: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, G, W), lambda i: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, rows, G, 128), lambda i: (i, 0, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, G, W), lambda i: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, G, W), lambda i: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, G, NSPAD), lambda i: (i, 0, 0),
                         memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((1, G, W), lambda i: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, G, W), lambda i: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, G, NSPAD), lambda i: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, rows + 1, G, W), lambda i: (i, 0, 0, 0),
                         memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NG, G, W), jnp.int32),
            jax.ShapeDtypeStruct((NG, G, W), jnp.int32),
            jax.ShapeDtypeStruct((NG, G, NSPAD), jnp.int32),
            jax.ShapeDtypeStruct((NG, rows + 1, G, W), jnp.uint8),
        ],
        # production shapes double-buffer past the default 16 MiB
        # scoped-vmem cap (the tb block alone is (rows+1)*G*W bytes);
        # v5e has 128 MiB of VMEM — let the kernel use it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(a_small.reshape(NG, G, rows).astype(jnp.int32),
      b_small.reshape(NG, G, W).astype(jnp.int32),
      srow_all.reshape(NG, G, rows, 128).transpose(0, 2, 1, 3),
      CC0.reshape(NG, G, W), DD0.reshape(NG, G, W),
      sc.reshape(NG, G, NSPAD))

    # (NG, rows+1, G, W) -> (B, rows+1, W): row axis was kept leading
    # inside the kernel for Mosaic's benefit
    tb = tb.transpose(0, 2, 1, 3)
    sc_o = sc_o.reshape(B, NSPAD)
    out_state = {
        "CC": cc_o.reshape(B, W), "DD": dd_o.reshape(B, W),
        "LY": sc_o[:, 0], "RY": sc_o[:, 1], "row": sc_o[:, 2],
        "best": sc_o[:, 3], "end1": sc_o[:, 4], "end2": sc_o[:, 5],
        "bscore": sc_o[:, 6], "bflag": sc_o[:, 7] != 0,
        "tbp": sc_o[:, 8], "rows_used": sc_o[:, 9],
        "maxRY": sc_o[:, 10], "status": sc_o[:, 11],
        "done": sc_o[:, 12] != 0,
    }
    return out_state, tb.reshape(B, rows + 1, W)


# ---------------------------------------------------------------------------
# mega-launch on the Pallas kernel: gather + chunk in a device-side
# while loop, same contract as ydrop_exact.ydrop_mega
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("gap_e", "gap_oe", "y_drop", "lanes", "rows",
                     "max_blocks", "alpha", "trim_to_peak", "tb_cap",
                     "with_tb", "G", "interpret"))
def ydrop_mega_pallas(v1c, v2c, a1, a2, low1, high1, low2, high2,
                      rev, M, N, state, prev_off0, subsmall,
                      gap_e: int, gap_oe: int, y_drop: int,
                      lanes: int, rows: int, max_blocks: int,
                      alpha: int, trim_to_peak: bool, tb_cap: int,
                      with_tb: bool = True, G: int = 8,
                      interpret: bool = False):
    """Pallas-backed ydrop_mega: up to `max_blocks` resumable chunks
    without leaving the device, windows gathered batched from the
    device-resident compact-coded sequences (exact index arithmetic
    of ydrop_exact._mega_one; reference row sweep
    gapped_extend.c:3683-3775).  Returns the same
    (state', prev_off', packed, tb_all, row_lo, row_hi, col0) tuple,
    with tb_all shaped (B, max_blocks, rows+1, lanes)."""
    W = lanes
    B = a1.shape[0]
    R1 = rows + 1
    r_iota = jnp.arange(rows, dtype=jnp.int32)[None, :]
    l_iota = jnp.arange(W, dtype=jnp.int32)[None, :]
    L1 = v1c.shape[0]
    L2 = v2c.shape[0]

    def gather(st, prev_off):
        row_base = st["row"] - 1
        b_off = jnp.where(st["done"], prev_off, st["LY"])
        shift = b_off - prev_off
        a_idx = jnp.where(rev[:, None],
                          a1[:, None] - row_base[:, None] - r_iota,
                          a1[:, None] + 1 + row_base[:, None] + r_iota)
        a_ok = jnp.where(rev[:, None], a_idx >= low1[:, None],
                         (a_idx < high1[:, None])
                         & (a_idx >= low1[:, None]))
        a_win = jnp.where(
            a_ok, v1c[jnp.clip(a_idx, 0, L1 - 1)].astype(jnp.int32),
            0)
        c = b_off[:, None] + l_iota
        b_idx = jnp.where(rev[:, None], a2[:, None] + 1 - c,
                          a2[:, None] + c)
        b_ok = jnp.where(rev[:, None],
                         (b_idx >= low2[:, None]) & (c >= 1),
                         (b_idx < high2[:, None])
                         & (b_idx >= low2[:, None]))
        b_win = jnp.where(
            b_ok, v2c[jnp.clip(b_idx, 0, L2 - 1)].astype(jnp.int32),
            0)
        return a_win, b_win, b_off, shift

    kw = dict(gap_e=gap_e, gap_oe=gap_oe, y_drop=y_drop, lanes=W,
              rows=rows, alpha=alpha, trim_to_peak=trim_to_peak,
              tb_cap=tb_cap, G=G, interpret=interpret)

    def cond(carry):
        st = carry[0]
        k = carry[2]
        return (k < max_blocks) & jnp.any(~st["done"])

    def body(carry):
        st, prev_off, k, tb_all, row_lo, row_hi, col0 = carry
        row_base = st["row"] - 1
        a_win, b_win, b_off, shift = gather(st, prev_off)
        st2, tb = ydrop_chunk_pallas(
            a_win, b_win, b_off, shift, M, N, st, subsmall, **kw)
        if with_tb:
            tb_all = jax.lax.dynamic_update_slice(
                tb_all, tb[:, None], (0, k, 0, 0))
        # anchors already done ride along with keep=False (their tb
        # rows are zeros): exclude those blocks from the traceback
        # walker's block selection
        lo_val = jnp.where(st["done"], jnp.int32(1 << 30),
                           row_base + 1)
        row_lo = jax.lax.dynamic_update_slice(
            row_lo, lo_val[:, None], (0, k))
        row_hi = jax.lax.dynamic_update_slice(
            row_hi, st2["rows_used"][:, None], (0, k))
        col0 = jax.lax.dynamic_update_slice(
            col0, b_off[:, None], (0, k))
        return st2, b_off, k + 1, tb_all, row_lo, row_hi, col0

    tb0 = jnp.zeros((B, max_blocks if with_tb else 1,
                     R1 if with_tb else 1,
                     W if with_tb else 1), jnp.uint8)
    z = jnp.zeros((B, max_blocks), jnp.int32)
    st0 = {k: state[k] for k in
           ("CC", "DD", "LY", "RY", "row", "best", "end1", "end2",
            "bscore", "bflag", "tbp", "rows_used", "maxRY", "status",
            "done")}
    carry = (st0, prev_off0.astype(jnp.int32), jnp.int32(0), tb0,
             z, z, z)
    st, prev_off, k, tb_all, row_lo, row_hi, col0 = \
        jax.lax.while_loop(cond, body, carry)
    packed = jnp.stack([
        st["row"], st["LY"], st["rows_used"],
        st["done"].astype(jnp.int32), st["status"], st["best"],
        st["end1"], st["end2"], st["bscore"],
        st["bflag"].astype(jnp.int32), st["tbp"], st["maxRY"],
        jnp.broadcast_to(k, st["row"].shape)])
    return st, prev_off, packed, tb_all, row_lo, row_hi, col0
