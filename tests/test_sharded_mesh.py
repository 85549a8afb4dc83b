"""Mesh-executed sharded target search (search/sharded_mesh.py): the
shard-local probe+extend SPMD program on the 8-virtual-device CPU mesh
must reproduce the scalar engine hit-for-hit, 2- and 4-shard, with no
device ever holding the whole target (the executable device story for
the lastz_32/lastz_40 tier, reference src/Makefile:19-25)."""

import numpy as np
import pytest

from lastz_tpu.config import GFEX_XDROP, ScoreThreshold
from lastz_tpu.core.encoding import UPPER_NUC_TO_BITS
from lastz_tpu.core.scoring import new_dna_score_set
from lastz_tpu.core.seeds import parse_seed
from lastz_tpu.index.postable import build_seed_position_table
from lastz_tpu.search.engine import HitProcessorParams, SeedSearchEngine

jax = pytest.importorskip("jax")


def _seqs(n=30000, seed=5, exact_repeat=True):
    """Random target with a mutated homology plus (optionally) a long
    EXACT repeat crossing the 2- and 4-shard borders, so extensions
    must outrun the resident halo and take the halo-gather path."""
    rng = np.random.default_rng(seed)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    s1 = alpha[rng.integers(0, 4, n)]
    s2m = s1[2000:7000].copy()
    mut = rng.random(len(s2m)) < 0.12
    s2m[mut] = alpha[rng.integers(0, 4, mut.sum())]
    parts = [s2m]
    if exact_repeat:
        # 4-shard borders at ~7.5k/15k/22.5k; 2-shard at ~15k.
        # an exact 12 kbp copy spanning [9000, 21000) crosses both.
        parts.append(s1[9000:21000].copy())
    parts.append(alpha[rng.integers(0, 4, 1500)])
    return s1, np.concatenate(parts)


def _engine(s1, s2, pt, hits):
    sc = new_dna_score_set()
    hp = HitProcessorParams(
        gf_extend=GFEX_XDROP, scoring=sc, x_drop=910,
        hsp_threshold=ScoreThreshold("S", 3000))
    return SeedSearchEngine(
        s1, pt, s2, pt.seed, UPPER_NUC_TO_BITS, hp,
        lambda p1, p2, ln, s: hits.append((p1, p2, ln, s)) or ln)


def _scalar_hits(s1, s2, seed, step=1):
    import os
    pt = build_seed_position_table(
        s1, 0, 0, UPPER_NUC_TO_BITS, seed, step)
    hits = []
    saved = os.environ.get("LASTZ_TPU_SCALAR_SEARCH")
    os.environ["LASTZ_TPU_SCALAR_SEARCH"] = "1"
    try:
        _engine(s1, s2, pt, hits).search(0, len(s2))
    finally:
        if saved is None:
            os.environ.pop("LASTZ_TPU_SCALAR_SEARCH", None)
        else:
            os.environ["LASTZ_TPU_SCALAR_SEARCH"] = saved
    return hits


def _mesh_hits(s1, s2, seed, n_shards, halo, step=1):
    from lastz_tpu.search.sharded_mesh import (
        MeshShardedIndex, sharded_mesh_search)
    sc = new_dna_score_set()
    index = MeshShardedIndex(
        s1, UPPER_NUC_TO_BITS, seed, step, n_shards, sc.sub,
        ext_halo=halo)
    # devices hold strict slices, never the whole target
    spans = index.res_hi - index.res_lo
    assert (spans < len(s1)).all(), spans
    # one shard per device, placed (not replicated)
    shards = index.codes_d.addressable_shards
    assert len(shards) >= n_shards
    per_dev = [sh for sh in shards if sh.data.shape[0] > 0]
    assert all(sh.data.shape[0] == 1 for sh in per_dev)
    assert len({sh.device for sh in per_dev}) == n_shards
    hits = []
    pt = build_seed_position_table(
        s1, 0, 0, UPPER_NUC_TO_BITS, seed, step)
    eng = _engine(s1, s2, pt, hits)
    got = sharded_mesh_search(eng, index)
    assert got is not None
    return hits, index


@pytest.mark.parametrize("n_shards", [2, 4])
def test_mesh_sharded_equals_scalar(n_shards):
    s1, s2 = _seqs()
    seed = parse_seed("1110100110010101111", with_trans=1)
    ref = _scalar_hits(s1, s2, seed)
    assert len(ref) > 0
    got, _ = _mesh_hits(s1, s2, seed, n_shards, halo=2048)
    assert got == ref


def test_mesh_halo_gather_exercised():
    """The 12 kbp exact border-crossing repeat must outrun a small
    halo, forcing gathered-window re-extensions — and the results
    still match the scalar oracle exactly."""
    from lastz_tpu import stats as st_mod
    st_mod.reset()
    s1, s2 = _seqs()
    seed = parse_seed("1110100110010101111", with_trans=1)
    ref = _scalar_hits(s1, s2, seed)
    got, index = _mesh_hits(s1, s2, seed, 4, halo=512)
    assert got == ref
    assert st_mod.current.extra.get("shard halo-gathers", 0) > 0


def test_mesh_sharded_step_and_small():
    """step>1 and a target much larger than the query, 3 shards."""
    s1, s2 = _seqs(n=24000, seed=11, exact_repeat=False)
    seed = parse_seed("1110100110010101111", with_trans=1)
    ref = _scalar_hits(s1, s2, seed, step=3)
    assert len(ref) > 0
    got, _ = _mesh_hits(s1, s2, seed, 3, halo=4096, step=3)
    assert got == ref


def test_gather_codes_matches_target():
    from lastz_tpu.core.scoring import new_dna_score_set
    from lastz_tpu.search.sharded_mesh import MeshShardedIndex
    s1, _ = _seqs(n=20000, seed=3, exact_repeat=False)
    seed = parse_seed("1110100110010101111", with_trans=1)
    sc = new_dna_score_set()
    index = MeshShardedIndex(
        s1, UPPER_NUC_TO_BITS, seed, 1, 4, sc.sub, ext_halo=1024)
    want = index.code_map[s1]
    for lo, hi in [(0, 20000), (4990, 5010), (14000, 19000),
                   (0, 1), (19999, 20000)]:
        np.testing.assert_array_equal(
            index.gather_codes(lo, hi), want[lo:hi])
