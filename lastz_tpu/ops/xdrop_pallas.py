"""Pallas TPU kernel for the gap-free x-drop scan (reference
xdrop_extend_seed_hit, seed_search.c:2528-2801).

XLA's gather lowering moves ~1.3e8 elements/s on this part no matter
how the indices are shaped; measured Mosaic window loads from VMEM run
>2.5e10 elements/s.  This kernel therefore owns the scan's inner
loop; the math is cell-for-cell the continuation algebra of
ops/hitgen._xdrop_round, verified by the same oracle tests.

Layout:
  * hits are sorted by target position and processed in blocks of NB;
    each grid program DMAs one (TS_ROWS, 128) int32 window of the
    target around its block (window row base via scalar prefetch) and
    keeps the launch's whole query chunk window resident in VMEM;
  * per hit, both directions scan in 128-cell chunks: two one-row
    loads + a roll produce the cell windows, scores come from a
    static K*K select chain, and the prefix sum/max run as log-shift
    roll chains (ascending or descending lane order depending on the
    scan direction);
  * a hit whose scan would leave either window ESCAPES with its
    carried state (base/cum/runmax/best/kbest); the XLA wave
    continuation (hitgen._xdrop_waves) finishes those rare long
    scans exactly.

Everything is int32 — (1, 128) vectors, SMEM scalars, pltpu.roll —
the vocabulary proven against this environment's remote Mosaic
compiler.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NB = 2048            # hits per grid program
TS_ROWS = 256        # target window rows (32768 codes)
LMARGIN = 12288      # window codes kept left of a block's first hit
QMARGIN = 16384      # query window margin beyond the chunk
# plain Python ints: a jnp scalar here becomes a captured constant
# inside the Pallas kernel closure, which pallas_call rejects
MIN32 = -(1 << 30)
BIG32 = 1 << 30

_SH = (1, 2, 4, 8, 16, 32, 64)


def _prefix_sum(x, l_iota, asc: bool):
    from jax.experimental.pallas import tpu as pltpu
    for sh in _SH:
        if asc:
            x = x + jnp.where(l_iota >= sh, pltpu.roll(x, sh, 1), 0)
        else:
            # roll is cyclic: left-shift by sh == right-shift 128-sh
            # (pltpu.roll rejects negative shifts)
            x = x + jnp.where(l_iota <= 127 - sh,
                              pltpu.roll(x, 128 - sh, 1), 0)
    return x


def _prefix_max(x, l_iota, asc: bool):
    from jax.experimental.pallas import tpu as pltpu
    for sh in _SH:
        if asc:
            x = jnp.maximum(
                x, jnp.where(l_iota >= sh, pltpu.roll(x, sh, 1),
                             MIN32))
        else:
            x = jnp.maximum(
                x, jnp.where(l_iota <= 127 - sh,
                             pltpu.roll(x, 128 - sh, 1), MIN32))
    return x


def _window(ref, w):
    """(1, 128) int32 codes at flat offsets [w, w+128) of a rows-of-128
    ref (two row loads + a roll; caller guarantees bounds)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    r = w // 128
    off = w % 128
    two = jnp.concatenate(
        [ref[pl.ds(r, 1), :], ref[pl.ds(r + 1, 1), :]], axis=1)
    # cyclic left-shift by off == right-shift by 256-off (pltpu.roll
    # rejects negative shifts); off == 0 maps to 256 == identity
    return pltpu.roll(two, (256 - off) % 256, 1)[:, :128]


def _make_kernel(sub_tuple: tuple, K: int, x_drop: int,
                 q_rows: int, nblk: int):
    import jax.experimental.pallas as pl

    G = 8  # hits processed together: per-hit window loads feed one
    #        (8, 128)-wide vector pipeline, amortizing the scalar loop
    TS = TS_ROWS * 128
    QTS = q_rows * 128

    def scores(c1, c2):
        idx = c1 * K + c2
        s = jnp.zeros((G, 128), jnp.int32)
        for v, val in enumerate(sub_tuple):
            if val != 0:
                s = jnp.where(idx == v, jnp.int32(val), s)
        return s

    def scan_group(t_ref, q_ref, p1v, p2v, nv, asc: bool):
        """p1v/p2v/nv: (G, 1) int32.  Returns 7 (G, 1) arrays."""
        # created INSIDE the kernel: a closure-captured traced array
        # is rejected by pallas_call
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (G, 128), 1)
        l_scan = l_iota if asc else (127 - l_iota)

        # every mask in the loop state is an int32 0/1 vector: bool
        # (G, 1) vectors in the carry lower to i8<->i1 truncations
        # that Mosaic rejects ("Unsupported target bitwidth for
        # truncation")
        def cond(st):
            base, cum, runmax, best, kbest, consumed, live, esc = st
            return jnp.max(jnp.where(esc == 0, live, 0)) > 0

        def body(st):
            base, cum, runmax, best, kbest, consumed, live, esc = st
            if asc:
                w1 = p1v + base
                w2 = p2v + base
            else:
                w1 = p1v - base - 127
                w2 = p2v - base - 127
            esc_now = ((w1 < 0) | (w1 > TS - 129)
                       | (w2 < 0) | (w2 > QTS - 129))
            open_ = (live != 0) & (esc == 0)
            act = open_ & jnp.logical_not(esc_now)
            acti = jnp.where(act, 1, 0)
            esc = jnp.where(open_ & esc_now, jnp.int32(1), esc)

            rows1 = []
            rows2 = []
            for j in range(G):
                # scalar extraction must be from a 32-bit array
                # (Mosaic rejects bool-array scalarization)
                ok = acti[j, 0] != 0
                rows1.append(_window(
                    t_ref, jnp.where(ok, w1[j, 0], 0)))
                rows2.append(_window(
                    q_ref, jnp.where(ok, w2[j, 0], 0)))
            c1 = jnp.concatenate(rows1, axis=0)
            c2 = jnp.concatenate(rows2, axis=0)

            rem = nv - base
            valid = (l_scan < rem) & act
            x = jnp.where(valid, scores(c1, c2), 0)
            c = _prefix_sum(x, l_iota, asc) + cum
            m = jnp.maximum(_prefix_max(c, l_iota, asc), runmax)
            bad = (c < jnp.maximum(m, 0) - x_drop) & valid
            any_bad = jnp.max(jnp.where(bad, 1, 0), axis=1,
                              keepdims=True)
            first_bad = jnp.min(jnp.where(bad, l_scan, 128), axis=1,
                                keepdims=True)
            take = jnp.minimum(jnp.minimum(first_bad + 1, rem), 128)
            cc = jnp.where((l_scan < take) & act, c, MIN32)
            chunk_best = jnp.max(cc, axis=1, keepdims=True)
            chunk_arg = jnp.min(
                jnp.where(cc == chunk_best, l_scan, BIG32), axis=1,
                keepdims=True)
            better = act & (chunk_best > best)
            best = jnp.where(better, chunk_best, best)
            kbest = jnp.where(better, base + chunk_arg, kbest)
            consumed = jnp.where(act, base + take, consumed)
            pick = (l_scan == take - 1) & act
            cum = jnp.where(
                act, jnp.sum(jnp.where(pick, c, 0), axis=1,
                             keepdims=True), cum)
            runmax = jnp.where(
                act, jnp.sum(jnp.where(pick, m, 0), axis=1,
                             keepdims=True), runmax)
            base = jnp.where(act, base + 128, base)
            cont = jnp.where((any_bad == 0) & (rem > 128), 1, 0)
            live = jnp.where(act, cont, live)
            return (base, cum, runmax, best, kbest, consumed, live,
                    esc)

        z = jnp.zeros((G, 1), jnp.int32)
        st = (z, z, z, z, jnp.full((G, 1), -1, jnp.int32), z,
              jnp.where(nv > 0, 1, 0), z)
        st = jax.lax.while_loop(cond, body, st)
        base, cum, runmax, best, kbest, consumed, live, esc = st
        escf = jnp.where((live != 0) & (esc > 0), 1, 0)
        return consumed, best, kbest, base, cum, runmax, escf

    def kernel(base_ref, t_hbm, q_ref, p1_ref, p2_ref, nl_ref,
               nr_ref, *outs_and_scratch):
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        outs = outs_and_scratch[:14]
        t_ref, dma_sem = outs_and_scratch[14:]
        r_outs = outs[:7]
        l_outs = outs[7:]

        # the target window starts at an arbitrary ROW offset (hit
        # dependent), which BlockSpec index_maps cannot express (they
        # are in block units) — DMA the window from HBM explicitly
        b = pl.program_id(0)
        cp = pltpu.make_async_copy(
            t_hbm.at[pl.ds(base_ref[b], TS_ROWS)], t_ref, dma_sem)
        cp.start()
        cp.wait()

        def group(g, carry):
            i0 = g * G
            idx = [((i0 + j) // 256, (i0 + j) % 256)
                   for j in range(G)]
            p1v = jnp.stack(
                [p1_ref[0, hi, lo] for hi, lo in idx]).reshape(G, 1)
            p2v = jnp.stack(
                [p2_ref[0, hi, lo] for hi, lo in idx]).reshape(G, 1)
            nlv = jnp.stack(
                [nl_ref[0, hi, lo] for hi, lo in idx]).reshape(G, 1)
            nrv = jnp.stack(
                [nr_ref[0, hi, lo] for hi, lo in idx]).reshape(G, 1)
            r = scan_group(t_ref, q_ref, p1v, p2v, nrv, True)
            for a in range(7):
                for j, (hi, lo) in enumerate(idx):
                    r_outs[a][0, hi, lo] = r[a][j, 0]
            l = scan_group(t_ref, q_ref, p1v - 1, p2v - 1, nlv,
                           False)
            for a in range(7):
                for j, (hi, lo) in enumerate(idx):
                    l_outs[a][0, hi, lo] = l[a][j, 0]
            return carry

        jax.lax.fori_loop(0, NB // G, group, 0)

    return kernel


def xdrop_scan_pallas(seq1_rows, qwin_rows, base_rows,
                      p1rel, p2rel, n_l, n_r,
                      sub_tuple: tuple, K: int, x_drop: int,
                      interpret: bool = False):
    """Both-direction scans for H = NBLK*NB hits (already sorted by
    target position and made window-relative by the caller).

    seq1_rows: (R1, 128) int32 target codes (HBM; windows DMA'd per
    block); qwin_rows: (q_rows, 128) int32 query chunk window (VMEM);
    base_rows: (NBLK,) int32 target window row base per block;
    p1rel/p2rel/n_l/n_r: (NBLK, 8, 256) int32 per-hit.

    Returns 14 arrays (NBLK, 8, 256) int32:
      right: consumed, best, kbest, base, cum, runmax, escaped
      left:  consumed, best, kbest, base, cum, runmax, escaped
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nblk = p1rel.shape[0]
    q_rows = qwin_rows.shape[0]
    kernel = _make_kernel(sub_tuple, K, int(x_drop), q_rows, nblk)

    hrows = p1rel.shape[1]  # NB // 256
    hit_spec = pl.BlockSpec((1, hrows, 256),
                            lambda b, base: (b, 0, 0),
                            memory_space=pltpu.SMEM)
    out_sh = jax.ShapeDtypeStruct((nblk, hrows, 256), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            # whole target stays in HBM; the kernel DMAs its
            # (TS_ROWS, 128) window at the block's ROW offset
            # (base_rows is in rows — a BlockSpec index_map is in
            # block units and cannot address it)
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((q_rows, 128), lambda b, base: (0, 0),
                         memory_space=pltpu.VMEM),
            hit_spec, hit_spec, hit_spec, hit_spec,
        ],
        out_specs=[hit_spec] * 14,
        scratch_shapes=[
            pltpu.VMEM((TS_ROWS, 128), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=[out_sh] * 14,
        grid_spec=grid_spec,
        interpret=interpret,
    )(base_rows, seq1_rows, qwin_rows, p1rel, p2rel, n_l, n_r)
