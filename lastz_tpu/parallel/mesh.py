"""Multi-chip scaling: query-data-parallel sharding over a device mesh.

The reference's distribution story is "run N processes over query
shards, sharing the target index via a mmapped capsule"
(capsule.c:6-15 + README farm-out recipe).  The TPU-native design:

  * one `jax.sharding.Mesh` with a "dp" axis across all chips;
  * the target's seed index (CSR arrays) and the 4x4 score matrix are
    REPLICATED (they are read-only and small relative to HBM — the
    reference reaches the same conclusion via mmap sharing);
  * query blocks (fixed-size padded code arrays) are SHARDED along dp;
  * each chip scans its queries against the index, extends candidate
    anchors with the banded y-drop kernel, and the per-target-base
    census (dynamic masking state, the only cross-query coupling in
    the reference, masking.c:6-25) is combined with a `psum`;
  * alignments are gathered to the host(s) for the format writers.

shard_map keeps every collective explicit; within a pod slice the psum
and all_gather ride ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def make_dp_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), axis_names=("dp",))


def seed_count_kernel(query_codes, csr_start, seed_weight_mask):
    """Per-chip query scan: count index hits per query position.

    query_codes: (Q, L) int32 padded query blocks (this shard)
    csr_start: (4^w + 1,) int32 replicated CSR offsets
    Returns (Q, L) int32 hit counts (a cheap, fully-vectorized stand-in
    for the full hit-expansion path, used by the multi-chip dry run and
    scaling tests).
    """
    # pack 2-bit codes into seed words with a simple contiguous seed
    w = seed_weight_mask  # number of bases in the word
    Q, L = query_codes.shape
    words = jnp.zeros((Q, L), dtype=jnp.int32)
    valid = jnp.ones((Q, L), dtype=bool)
    for i in range(w):
        shifted = jnp.roll(query_codes, -i, axis=1)
        words = (words << 2) | jnp.maximum(shifted, 0)
        valid = valid & (shifted >= 0)
    words = jnp.where(valid, words, 0)
    counts = (jnp.take(csr_start, words + 1, fill_value=0)
              - jnp.take(csr_start, words, fill_value=0))
    return jnp.where(valid, counts, 0).astype(jnp.int32)


def make_sharded_pipeline(mesh: Mesh, band=128, max_rows=128, word=8):
    """Build the jitted multi-chip step: seed-count + y-drop batch +
    census psum, with queries sharded along dp."""
    from ..ops.ydrop_pallas import ydrop_extend_batch_xla

    def step(query_codes, target_codes, csr_start, sub4, anchors12,
             params):
        # counts: how much seed work each query position generates
        counts = seed_count_kernel(query_codes, csr_start, word)

        # y-drop extension of this shard's anchor batch
        c1 = jnp.take(target_codes, anchors12[:, 0:1]
                      + jnp.arange(max_rows)[None, :], fill_value=-1)
        c2 = jnp.take(query_codes.reshape(-1), anchors12[:, 1:2]
                      + jnp.arange(band)[None, :], fill_value=-1)
        out = ydrop_extend_batch_xla(
            c1, c2, sub4, params, band=band, max_rows=max_rows)

        # census of target coverage, combined across the dp axis: the
        # only cross-query coupling (dynamic masking)
        census_local = jnp.zeros_like(target_codes, dtype=jnp.int32)
        starts = anchors12[:, 0]
        lens = jnp.minimum(out[:, 1] + 1, max_rows)
        pos = starts[:, None] + jnp.arange(max_rows)[None, :]
        cover = (jnp.arange(max_rows)[None, :] < lens[:, None])
        census_local = census_local.at[pos.reshape(-1)].add(
            cover.reshape(-1).astype(jnp.int32), mode="drop")
        census = jax.lax.psum(census_local, "dp")

        total_hits = jax.lax.psum(jnp.sum(counts), "dp")
        return out, census, total_hits

    from jax.experimental.shard_map import shard_map

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P("dp", None), P(), P(), P(), P("dp", None), P("dp", None)),
        out_specs=(P("dp", None), P(), P()),
        check_rep=False,
    )
    return jax.jit(sharded)
