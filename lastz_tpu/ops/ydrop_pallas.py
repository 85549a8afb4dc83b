"""Batched y-drop scoring as a Pallas TPU kernel (upper-bound
throughput study; the PRODUCTION gapped stage is ops/ydrop_exact.py).

This kernel computes best score + end cell only, with a per-lane
relaxation of the y-drop prune and no traceback — it measures the
hardware's throughput ceiling for the recurrence, not golden-exact
results.  Anchors are extended concurrently — SUBBATCH per grid
program, one per VPU sublane, with the DP band across the lane
dimension (reference row sweep: gapped_extend.c:3683).

The production kernel (_ydrop_wavefront_kernel) sweeps ANTIDIAGONALS:
at step d, lane l computes cell (row d-l, col l+1).  All three affine
states depend only on the two previous diagonals, so each step is pure
elementwise VPU work plus four single-lane shifts — no prefix scan —
and the recurrence is the EXACT affine DP (no back-to-back-gap leak).
y-drop pruning is relaxed to the lane's own running best (scores can
only be >= the reference's; exact output parity is provided by the
host engine).  The older row-sweep kernel (_ydrop_band_kernel), which
solves the intra-row I-dependence as a decayed prefix-max scan, is
kept as an alternative.

Returns per-anchor best score and end coordinates; row r in kernel
coordinates corresponds to the reference's DP row r+1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF_I32 = -(1 << 30)
SUBBATCH = 32  # anchors per grid program (VPU sublanes)


def _ydrop_band_kernel(scalars_ref, codes1_ref, codes2_ref, out_ref,
                       *, band: int, max_rows: int):
    """8 anchors per program: DP band in lanes, anchors in sublanes.

    scalars: SMEM (4,): [gap_e, gap_oe, y_drop, sub_base] where the
             16 substitution scores follow at indices 4..19
    codes1:  VMEM (8, max_rows) int32 vertical codes (-1 past end)
    codes2:  VMEM (8, band) int32 horizontal codes (-1 past end)
    out:     VMEM (8, 128) int32 [best, end_row, end_col, ...]
    """
    import jax.experimental.pallas as pl

    gap_e = scalars_ref[0]
    gap_oe = scalars_ref[1]
    y_drop = scalars_ref[2]

    codes2 = codes2_ref[:]  # (8, band)
    col_ix = jax.lax.broadcasted_iota(jnp.int32, (SUBBATCH, band), 1)

    # DP column c consumes B[c] = codes2[c-1]
    negcol = jnp.full((SUBBATCH, 1), -1, jnp.int32)
    b_shift = jnp.concatenate([negcol, codes2[:, :-1]], axis=1)
    col_valid = (col_ix >= 1) & (b_shift >= 0)
    b_code = jnp.maximum(b_shift, 0)

    # four substitution planes, one per vertical base (computed once)
    def plane(a):
        s = jnp.where(b_code == 0, scalars_ref[4 + a * 4 + 0],
            jnp.where(b_code == 1, scalars_ref[4 + a * 4 + 1],
            jnp.where(b_code == 2, scalars_ref[4 + a * 4 + 2],
                      scalars_ref[4 + a * 4 + 3])))
        return jnp.where(col_valid, s, NEG_INF_I32 // 2)

    planes = [plane(a) for a in range(4)]

    c_first = jnp.where(col_ix == 0, 0,
                        -gap_oe - (col_ix - 1) * gap_e).astype(jnp.int32)
    c_first = jnp.where(c_first >= -y_drop, c_first, NEG_INF_I32)
    c_first = jnp.where(col_valid | (col_ix == 0), c_first, NEG_INF_I32)
    d_first = jnp.full((SUBBATCH, band), NEG_INF_I32, jnp.int32)

    decay = col_ix * gap_e
    pad1 = jnp.full((SUBBATCH, 1), NEG_INF_I32, jnp.int32)

    # the per-row (8,1) vertical-code column is extracted with a masked
    # lane-reduction over a 128-lane aligned window (dynamic single-
    # lane loads are not supported by Mosaic; 128-aligned slices are)
    row_lane128 = jax.lax.broadcasted_iota(jnp.int32, (SUBBATCH, 128), 1)

    def row_body(row, carry):
        c_prev, d_prev, best_vec, row_of_best = carry

        chunk_start = pl.multiple_of((row // 128) * 128, 128)
        chunk = codes1_ref[:, pl.ds(chunk_start, 128)]  # (8, 128)
        a_code = jnp.max(
            jnp.where(row_lane128 == (row % 128), chunk, -2),
            axis=1, keepdims=True)  # (8, 1)
        a_ok = a_code >= 0
        s = jnp.where(a_code == 0, planes[0],
            jnp.where(a_code == 1, planes[1],
            jnp.where(a_code == 2, planes[2], planes[3])))
        s = jnp.where(a_ok, s, NEG_INF_I32 // 2)

        c_shift = jnp.concatenate([pad1, c_prev[:, :-1]], axis=1)
        base = c_shift + s

        # D[r][c] = max(D[r-1][c] - gapE, C[r-1][c] - gapOE)
        d_cur = jnp.maximum(d_prev - gap_e, c_prev - gap_oe)
        t = jnp.maximum(base, d_cur)

        # I via decayed prefix max (Hillis-Steele, log2(band) steps)
        g = t - gap_oe + decay
        shift = 1
        while shift < band:
            pad = jnp.full((SUBBATCH, shift), NEG_INF_I32, jnp.int32)
            g = jnp.maximum(g, jnp.concatenate(
                [pad, g[:, :-shift]], axis=1))
            shift *= 2
        g_shift = jnp.concatenate([pad1, g[:, :-1]], axis=1)
        i_cur = g_shift - decay + gap_e

        c_cur = jnp.maximum(t, i_cur)
        # prune vs the LANE's running best (a further relaxation of
        # the reference's global-best y-drop; scores only go up) --
        # this keeps the whole row body reduction-free, the per-row
        # lane reductions were ~40% of the loop cost
        c_cur = jnp.where(c_cur >= best_vec - y_drop, c_cur, NEG_INF_I32)
        c_cur = jnp.where(col_valid, c_cur, NEG_INF_I32)

        improved = c_cur >= best_vec
        best_vec = jnp.where(improved, c_cur, best_vec)
        row_of_best = jnp.where(improved, row, row_of_best)
        return c_cur, d_cur, best_vec, row_of_best

    zeros = jnp.zeros((SUBBATCH, band), jnp.int32)
    init = (c_first, d_first, zeros, zeros)
    _, _, best_vec, row_of_best = jax.lax.fori_loop(
        0, max_rows, row_body, init)

    # deferred argmax with the reference's >=-update tie-breaking:
    # latest row achieving the max, largest column within that row
    best = jnp.max(best_vec, axis=1, keepdims=True)  # (8, 1)
    at_max = best_vec == best
    end_row = jnp.max(jnp.where(at_max, row_of_best, -1),
                      axis=1, keepdims=True)
    end_col = jnp.max(
        jnp.where(at_max & (row_of_best == end_row), col_ix, -1),
        axis=1, keepdims=True)
    end_row = jnp.maximum(end_row, 0)
    end_col = jnp.maximum(end_col, 0)

    oix = jax.lax.broadcasted_iota(jnp.int32, (SUBBATCH, 128), 1)
    out = jnp.where(oix == 0, best,
          jnp.where(oix == 1, end_row,
          jnp.where(oix == 2, end_col, 0)))
    out_ref[:] = out.astype(jnp.int32)


def _ydrop_wavefront_kernel(scalars_ref, codes1_ref, codes2_ref, out_ref,
                            *, band: int, max_rows: int):
    """Antidiagonal (wavefront) form of the same banded affine DP.

    Lane l holds DP column c = l+1; at step d, lane l computes cell
    (row r = d - l, col l+1).  All three recurrence inputs live on the
    two previous diagonals, so each step is pure elementwise work plus
    two single-lane shifts -- no prefix scan at all (the row-sweep
    kernel spends ~half its time in a log2(band) Hillis-Steele scan).
    This is also the EXACT affine recurrence (the I state is computed
    directly, not via the decayed-max closed form).
    """
    import jax.experimental.pallas as pl

    gap_e = scalars_ref[0]
    gap_oe = scalars_ref[1]
    y_drop = scalars_ref[2]

    S = SUBBATCH
    codes2 = codes2_ref[:]  # (S, band)
    l_ix = jax.lax.broadcasted_iota(jnp.int32, (S, band), 1)
    col_valid = codes2 >= 0  # lane l <-> col l+1 consumes B[l]

    def plane(a):
        b = jnp.maximum(codes2, 0)
        s = jnp.where(b == 0, scalars_ref[4 + a * 4 + 0],
            jnp.where(b == 1, scalars_ref[4 + a * 4 + 1],
            jnp.where(b == 2, scalars_ref[4 + a * 4 + 2],
                      scalars_ref[4 + a * 4 + 3])))
        return jnp.where(col_valid, s, NEG_INF_I32 // 2)

    planes = [plane(a) for a in range(4)]

    # row-0 boundary C(0, l+1) = -gapOE - l*gapE, y-drop masked
    c0row = (-gap_oe - l_ix * gap_e).astype(jnp.int32)
    c0row = jnp.where((c0row >= -y_drop) & col_valid, c0row, NEG_INF_I32)

    neg = jnp.full((S, band), NEG_INF_I32, jnp.int32)
    neg1 = jnp.full((S, 1), NEG_INF_I32, jnp.int32)
    row_lane128 = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)

    def shift_in(x, fill):
        return jnp.concatenate([fill, x[:, :-1]], axis=1)

    ones1 = jnp.ones((S, 1), jnp.int32)

    def vcol0(r):
        # C(r, 0): 0 at r==0, else the vertical-gap boundary
        v = jnp.where(r == 0, 0, -gap_oe - (r - 1) * gap_e)
        v = jnp.where((v >= -y_drop) & (r >= 0), v, NEG_INF_I32)
        return ones1 * v

    def step(d, carry):
        c_m1, c_m2, d_m1, i_m1, a_vec, best_vec, d_of_best = carry

        # shift A[d-1] into lane 0 of the diagonal code vector
        idx = jnp.minimum(d - 1, max_rows - 1)
        chunk_start = pl.multiple_of((idx // 128) * 128, 128)
        chunk = codes1_ref[:, pl.ds(chunk_start, 128)]
        a_new = jnp.max(
            jnp.where(row_lane128 == (idx % 128), chunk, -2),
            axis=1, keepdims=True)
        a_new = jnp.where(ones1 * (d - 1) < max_rows, a_new, -1)
        a_vec = shift_in(a_vec, a_new)

        # a_vec is -1 exactly off-grid (lanes the diagonal hasn't
        # reached keep the -1 init; lanes past max_rows shift in -1)
        on_grid = (a_vec >= 0) & col_valid

        s = jnp.where(a_vec == 0, planes[0],
            jnp.where(a_vec == 1, planes[1],
            jnp.where(a_vec == 2, planes[2], planes[3])))

        # lane 0 computes cell (r=d, c=1): its diagonal input is
        # C(d-1, 0) and its leftward input is C(d, 0)
        sub_path = shift_in(c_m2, vcol0(d - 1)) + s
        d_cur = jnp.maximum(d_m1 - gap_e, c_m1 - gap_oe)
        i_cur = jnp.maximum(shift_in(i_m1, neg1) - gap_e,
                            shift_in(c_m1, vcol0(d)) - gap_oe)
        c_cur = jnp.maximum(jnp.maximum(sub_path, d_cur), i_cur)

        # per-lane y-drop prune (same relaxation as the row-sweep
        # kernel) + off-grid masking in one select; D/I need no
        # masking: off-grid C is NEG so they decay monotonically
        keep = on_grid & (c_cur >= best_vec - y_drop)
        c_cur = jnp.where(keep, c_cur, NEG_INF_I32)

        # inject the row-0 boundary where this diagonal crosses row 0
        c_cur = jnp.where(d - l_ix == 0, c0row, c_cur)

        improved = c_cur >= best_vec
        best_vec = jnp.where(improved, c_cur, best_vec)
        d_of_best = jnp.where(improved, d, d_of_best)
        return c_cur, c_m1, d_cur, i_cur, a_vec, best_vec, d_of_best

    # Mosaic workaround: splat-constant loop carries get inferred as
    # lane/sublane-replicated and the backedge then needs an invalid
    # {0,0}->{*,*} relayout; seed every carry with an unfoldable zero
    # so the carries start (and stay) in the general {0,0} layout
    zero_v = jnp.where(codes2 < -999999, 1, 0).astype(jnp.int32)
    zeros = jnp.zeros((S, band), jnp.int32) + zero_v
    a_init = jnp.full((S, band), -1, jnp.int32) + zero_v
    neg_init = neg + zero_v
    init = (neg_init, neg_init, neg_init, neg_init, a_init, zeros, zeros)
    (_, _, _, _, _, best_vec, d_of_best) = jax.lax.fori_loop(
        1, max_rows + band, step, init)

    # tie-breaking: latest row achieving the max, then largest column
    r_of_best = d_of_best - l_ix
    best = jnp.max(best_vec, axis=1, keepdims=True)
    at_max = best_vec == best
    end_row = jnp.max(jnp.where(at_max, r_of_best, -1),
                      axis=1, keepdims=True)
    end_col = jnp.max(
        jnp.where(at_max & (r_of_best == end_row), l_ix + 1, -1),
        axis=1, keepdims=True)
    # report end_row in the same convention as the row-sweep/XLA
    # variants (kernel row r == DP row r+1)
    end_row = jnp.maximum(end_row - 1, 0)
    end_col = jnp.where(end_row >= 0, jnp.maximum(end_col, 0), 0)

    oix = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
    out = jnp.where(oix == 0, best,
          jnp.where(oix == 1, end_row,
          jnp.where(oix == 2, end_col, 0)))
    out_ref[:] = out.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("band", "max_rows", "interpret"))
def ydrop_extend_batch(codes1, codes2, sub4, params,
                       band: int = 512, max_rows: int = 1024,
                       interpret: bool = False):
    """Extend a batch of anchors (one-sided), returning scores + ends.

    codes1: (B, max_rows) int32 vertical codes (-1 past the end)
    codes2: (B, band) int32 horizontal codes (-1 past the end)
    sub4: (4, 4) int32 substitution scores
    params: (B, 4) int32 [gap_e, gap_oe, y_drop, n_cols] (gap/y-drop
            values must be uniform across the batch)
    returns: (B, 128) int32; [:, 0]=best, [:, 1]=end_row, [:, 2]=end_col
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = codes1.shape[0]
    if B % SUBBATCH != 0:
        pad = SUBBATCH - B % SUBBATCH
        codes1 = jnp.concatenate(
            [codes1, jnp.full((pad, max_rows), -1, codes1.dtype)])
        codes2 = jnp.concatenate(
            [codes2, jnp.full((pad, band), -1, codes2.dtype)])
        Bp = B + pad
    else:
        Bp = B
    kernel = functools.partial(
        _ydrop_wavefront_kernel, band=band, max_rows=max_rows)
    scalars = jnp.concatenate([
        params[0, :3].astype(jnp.int32), jnp.zeros((1,), jnp.int32),
        sub4.reshape(16).astype(jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp // SUBBATCH,),
        in_specs=[
            pl.BlockSpec((SUBBATCH, max_rows), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBBATCH, band), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SUBBATCH, 128), lambda b, *_: (b, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, 128), jnp.int32),
        interpret=interpret,
    )(scalars, codes1.astype(jnp.int32), codes2.astype(jnp.int32))
    return out[:B]


# ---------------------------------------------------------------------------
# plain-XLA version of the same recurrence (any backend; numerical
# oracle for the kernel and the jit target for CPU-mesh tests)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("band", "max_rows"))
def ydrop_extend_batch_xla(codes1, codes2, sub4, params,
                           band: int = 512, max_rows: int = 1024):
    sub_flat = sub4.reshape(16).astype(jnp.int32)

    def one(codes1_row, codes2_row, p):
        gap_e, gap_oe, y_drop = p[0], p[1], p[2]
        codes2_row = codes2_row.reshape(1, band)
        col_ix = jax.lax.broadcasted_iota(jnp.int32, (1, band), 1)
        b_shift = jnp.concatenate(
            [jnp.full((1, 1), -1, jnp.int32), codes2_row[:, :-1]], axis=1)
        col_valid = (col_ix >= 1) & (b_shift >= 0)
        b_code = jnp.maximum(b_shift, 0)

        c_first = jnp.where(col_ix == 0, 0,
                            -gap_oe - (col_ix - 1) * gap_e).astype(jnp.int32)
        c_first = jnp.where(c_first >= -y_drop, c_first, NEG_INF_I32)
        c_first = jnp.where(col_valid | (col_ix == 0), c_first, NEG_INF_I32)
        d_first = jnp.full((1, band), NEG_INF_I32, jnp.int32)
        decay = col_ix * gap_e
        pad1 = jnp.full((1, 1), NEG_INF_I32, jnp.int32)

        def row_body(row, carry):
            c_prev, d_prev, best, end_row, end_col = carry
            a_code = codes1_row[row]
            a_ok = a_code >= 0
            a4 = jnp.maximum(a_code, 0) * 4
            s = jnp.where(b_code == 0, sub_flat[a4 + 0],
                jnp.where(b_code == 1, sub_flat[a4 + 1],
                jnp.where(b_code == 2, sub_flat[a4 + 2], sub_flat[a4 + 3])))
            s = jnp.where(col_valid & a_ok, s, NEG_INF_I32 // 2)
            c_shift = jnp.concatenate([pad1, c_prev[:, :-1]], axis=1)
            base = c_shift + s
            d_cur = jnp.maximum(d_prev - gap_e, c_prev - gap_oe)
            t = jnp.maximum(base, d_cur)
            g = t - gap_oe + decay
            shift = 1
            while shift < band:
                pad = jnp.full((1, shift), NEG_INF_I32, jnp.int32)
                g = jnp.maximum(g, jnp.concatenate(
                    [pad, g[:, :-shift]], axis=1))
                shift *= 2
            g_shift = jnp.concatenate([pad1, g[:, :-1]], axis=1)
            i_cur = g_shift - decay + gap_e
            c_cur = jnp.maximum(t, i_cur)
            c_cur = jnp.where(c_cur >= best - y_drop, c_cur, NEG_INF_I32)
            c_cur = jnp.where(col_valid, c_cur, NEG_INF_I32)
            row_best = jnp.max(c_cur)
            row_arg = jnp.max(jnp.where(c_cur == row_best, col_ix, -1))
            improved = row_best >= best
            best = jnp.where(improved, row_best, best)
            end_row = jnp.where(improved, row, end_row)
            end_col = jnp.where(improved, row_arg, end_col)
            return c_cur, d_cur, best, end_row, end_col

        init = (c_first, d_first, jnp.int32(0), jnp.int32(0), jnp.int32(0))
        _, _, best, end_row, end_col = jax.lax.fori_loop(
            0, max_rows, row_body, init)
        out = jnp.zeros((128,), dtype=jnp.int32)
        out = out.at[0].set(best)
        out = out.at[1].set(end_row)
        out = out.at[2].set(end_col)
        return out

    return jax.vmap(one, in_axes=(0, 0, 0))(
        codes1.astype(jnp.int32), codes2.astype(jnp.int32),
        params.astype(jnp.int32))


def prepare_anchor_batch(v1_codes, v2_codes, anchors, gap_e, gap_oe, y_drop,
                         band=512, max_rows=1024, reversed_=False):
    """Host-side gather of per-anchor code slices for the batch kernel.

    v1_codes/v2_codes: int8/int32 2-bit codes (-1 for invalid) of the
    full sequences.  anchors: list of (anchor1, anchor2) points.
    """
    B = len(anchors)
    codes1 = np.full((B, max_rows), -1, dtype=np.int32)
    codes2 = np.full((B, band), -1, dtype=np.int32)
    params = np.zeros((B, 4), dtype=np.int32)
    n1 = len(v1_codes)
    n2 = len(v2_codes)
    for k, (a1, a2) in enumerate(anchors):
        if not reversed_:
            r1 = v1_codes[a1 + 1 : min(a1 + 1 + max_rows, n1)]
            r2 = v2_codes[a2 + 1 : min(a2 + 1 + band - 1, n2)]
        else:
            r1 = v1_codes[max(0, a1 + 1 - max_rows) : a1 + 1][::-1]
            r2 = v2_codes[max(0, a2 + 1 - (band - 1)) : a2 + 1][::-1]
        codes1[k, : len(r1)] = r1
        codes2[k, : len(r2)] = r2
        params[k] = (gap_e, gap_oe, y_drop, min(len(r2), band - 1))
    return codes1, codes2, params
