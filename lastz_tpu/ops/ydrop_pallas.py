"""Batched y-drop gapped extension as a Pallas TPU kernel.

This is the production hot path for the aligner's dominant cost (the
reference's ydrop_one_sided_align row sweep, gapped_extend.c:3683).
Many anchors are extended concurrently, one DP per grid program, with
a fixed band width and row budget:

  * the 3-state affine recurrence is reorganized so each ROW is a
    fixed-width vector computation: the intra-row I-dependence is
    solved in closed form as a decayed prefix-max
        I[c] = max_{k<c}( T[k] - gapOE - (c-k)*gapE )
    which vectorizes as an associative max-scan over T[k] + k*gapE
    (this is exact, not an approximation);
  * y-drop pruning masks cells below (running best - yDrop); the
    running best is updated once per row (a cell-order relaxation of
    the reference's in-row update; scores it produces are >= the
    reference's and are verified/finalized by the exact engine when
    bit-parity output is required);
  * sequences enter as 2-bit codes; substitution scores materialize
    in-register from the 4x4 matrix with four masked selects per row,
    so HBM traffic is ~1 byte per DP *column*, not per cell.

The kernel returns per-anchor best score and end coordinates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF_I32 = -(1 << 30)


def _row_sweep(codes1_at, codes2_row, sub_flat, gap_e, gap_oe, y_drop,
               n_cols, band, max_rows):
    """Shared row-sweep recurrence over a (1, band) register file.

    codes1_at: row -> int32 code of the vertical sequence (-1 = end)
    codes2_row: (1, band) int32
    sub_flat: (16,) int32 row-major 4x4 substitution scores
    Returns (best, end_row, end_col).
    """
    col_ix = jax.lax.broadcasted_iota(jnp.int32, (1, band), 1)
    col_valid = (col_ix < n_cols) & (codes2_row >= 0)
    b_code = jnp.maximum(codes2_row, 0)

    c_first = jnp.where(col_ix == 0, 0,
                        -gap_oe - (col_ix - 1) * gap_e).astype(jnp.int32)
    c_first = jnp.where(c_first >= -y_drop, c_first, NEG_INF_I32)
    c_first = jnp.where(col_valid | (col_ix == 0), c_first, NEG_INF_I32)
    d_first = jnp.where(col_ix == 0, -gap_oe, c_first - gap_oe)

    decay = col_ix * gap_e
    neg_col = jnp.full((1, 1), NEG_INF_I32, jnp.int32)

    def row_body(row, carry):
        c_prev, d_prev, best, end_row, end_col = carry
        a_code = codes1_at(row)
        a_ok = a_code >= 0
        a4 = jnp.maximum(a_code, 0) * 4

        # substitution scores for this row: four masked selects against
        # the scalar entries of the matrix row
        s = jnp.where(b_code == 0, sub_flat[a4 + 0],
            jnp.where(b_code == 1, sub_flat[a4 + 1],
            jnp.where(b_code == 2, sub_flat[a4 + 2], sub_flat[a4 + 3])))
        s = jnp.where(col_valid & a_ok, s, NEG_INF_I32 // 2)

        c_shift = jnp.concatenate([neg_col, c_prev[:, :-1]], axis=1)
        base = c_shift + s

        d_cur = jnp.maximum(d_prev - gap_e, c_prev - gap_oe - gap_e)
        t = jnp.maximum(base, d_cur)

        g = t - gap_oe + decay
        g_scan = jax.lax.associative_scan(jnp.maximum, g, axis=1)
        g_shift = jnp.concatenate([neg_col, g_scan[:, :-1]], axis=1)
        i_cur = g_shift - decay - gap_e

        c_cur = jnp.maximum(t, i_cur)
        c_cur = jnp.where(c_cur >= best - y_drop, c_cur, NEG_INF_I32)
        c_cur = jnp.where(col_valid, c_cur, NEG_INF_I32)

        row_best = jnp.max(c_cur)
        row_arg = jnp.argmax(c_cur[0]).astype(jnp.int32)
        improved = row_best >= best
        best = jnp.where(improved, row_best, best)
        end_row = jnp.where(improved, row, end_row)
        end_col = jnp.where(improved, row_arg, end_col)
        return c_cur, d_cur, best, end_row, end_col

    init = (c_first, d_first, jnp.int32(0), jnp.int32(0), jnp.int32(0))
    _, _, best, end_row, end_col = jax.lax.fori_loop(
        0, max_rows, row_body, init)
    return best, end_row, end_col


def _ydrop_band_kernel(params_ref, codes1_ref, sub_ref, codes2_ref,
                       out_ref, *, band: int, max_rows: int):
    gap_e = params_ref[0, 0]
    gap_oe = params_ref[0, 1]
    y_drop = params_ref[0, 2]
    n_cols = params_ref[0, 3]

    best, end_row, end_col = _row_sweep(
        lambda row: codes1_ref[0, row],
        codes2_ref[:],
        sub_ref,
        gap_e, gap_oe, y_drop, n_cols, band, max_rows)

    out = jnp.zeros((1, 128), dtype=jnp.int32)
    out = out.at[0, 0].set(best)
    out = out.at[0, 1].set(end_row)
    out = out.at[0, 2].set(end_col)
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("band", "max_rows", "interpret"))
def ydrop_extend_batch(codes1, codes2, sub4, params,
                       band: int = 512, max_rows: int = 1024,
                       interpret: bool = False):
    """Extend a batch of anchors (one-sided), returning scores + ends.

    codes1: (B, max_rows) int32 vertical codes (-1 past the end)
    codes2: (B, band) int32 horizontal codes
    sub4: (4, 4) int32 substitution scores
    params: (B, 4) int32 [gap_e, gap_oe, y_drop, n_cols]
    returns: (B, 128) int32; [:, 0]=best, [:, 1]=end_row, [:, 2]=end_col
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = codes1.shape[0]
    kernel = functools.partial(
        _ydrop_band_kernel, band=band, max_rows=max_rows)
    sub_flat = sub4.reshape(16).astype(jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, max_rows), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((16,), lambda b: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, band), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 128), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
        interpret=interpret,
    )(params.astype(jnp.int32), codes1.astype(jnp.int32), sub_flat,
      codes2.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("band", "max_rows"))
def ydrop_extend_batch_xla(codes1, codes2, sub4, params,
                           band: int = 512, max_rows: int = 1024):
    """Same recurrence in plain XLA (vmap) — runs on any backend and is
    the numerical oracle for the Pallas kernel."""
    sub_flat = sub4.reshape(16).astype(jnp.int32)

    def one(codes1_row, codes2_row, p):
        best, end_row, end_col = _row_sweep(
            lambda row: codes1_row[row],
            codes2_row.reshape(1, band),
            sub_flat,
            p[0], p[1], p[2], p[3], band, max_rows)
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

    v1_codes/v2_codes: int8 2-bit codes (-1 for invalid) of the full
    sequences.  anchors: list of (anchor1, anchor2) anchor points.
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
            r2 = v2_codes[a2 + 1 : min(a2 + 1 + band, n2)]
        else:
            r1 = v1_codes[max(0, a1 + 1 - max_rows) : a1 + 1][::-1]
            r2 = v2_codes[max(0, a2 + 1 - band) : a2 + 1][::-1]
        codes1[k, : len(r1)] = r1
        codes2[k, : len(r2)] = r2
        params[k] = (gap_e, gap_oe, y_drop, len(r2))
    return codes1, codes2, params
