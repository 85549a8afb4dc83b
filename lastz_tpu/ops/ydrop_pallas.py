"""Batched y-drop gapped extension as a Pallas TPU kernel.

This is the production hot path for the aligner's dominant cost (the
reference's ydrop_one_sided_align row sweep, gapped_extend.c:3683).
Anchors are extended concurrently — 8 per grid program, one per VPU
sublane, with the DP band across the lane dimension:

  * the 3-state affine recurrence is reorganized so each ROW is a
    fixed-width vector computation: the intra-row I-dependence is
    solved in closed form as a decayed prefix-max
        I[c] = max_{k<c}( T[k] - gapOE - (c-1-k)*gapE )
    which vectorizes as a Hillis-Steele max-scan over
    g[k] = T[k] - gapOE + k*gapE  (exact, not an approximation);
  * y-drop pruning masks cells below (running best - yDrop), with the
    running best updated per row (a cell-order relaxation of the
    reference's in-cell update; resulting scores are >= the
    reference's and final output parity is provided by the exact host
    engine when required);
  * the per-row substitution vector is materialized in-register from
    four precomputed score planes (one per vertical base), so HBM
    traffic is ~1 byte per DP column, not per cell.

Returns per-anchor best score and end coordinates; end_row is the
number of vertical bases consumed minus... specifically row r in
kernel coordinates corresponds to the reference's DP row r+1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF_I32 = -(1 << 30)
SUBBATCH = 8  # anchors per grid program (VPU sublanes)


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
        c_prev, d_prev, best, end_row, end_col = carry

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
        c_cur = jnp.where(c_cur >= best - y_drop, c_cur, NEG_INF_I32)
        c_cur = jnp.where(col_valid, c_cur, NEG_INF_I32)

        row_best = jnp.max(c_cur, axis=1, keepdims=True)  # (8, 1)
        # last column achieving the max (reference's >= update rule)
        row_arg = jnp.max(
            jnp.where(c_cur == row_best, col_ix, -1),
            axis=1, keepdims=True)
        improved = row_best >= best
        best = jnp.where(improved, row_best, best)
        end_row = jnp.where(improved, row, end_row)
        end_col = jnp.where(improved, row_arg, end_col)
        return c_cur, d_cur, best, end_row, end_col

    zeros8 = jnp.zeros((SUBBATCH, 1), jnp.int32)
    init = (c_first, d_first, zeros8, zeros8, zeros8)
    _, _, best, end_row, end_col = jax.lax.fori_loop(
        0, max_rows, row_body, init)

    oix = jax.lax.broadcasted_iota(jnp.int32, (SUBBATCH, 128), 1)
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
        _ydrop_band_kernel, band=band, max_rows=max_rows)
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
