"""Interval-sharded target index (index/sharded.py): shard tables
built from slice+halo only must reproduce the unsharded index and the
unsharded search results exactly (the lastz_32/lastz_40 large-target
tier, reference src/Makefile:19-25, rebuilt as per-device shards)."""

import numpy as np
import pytest

from lastz_tpu.config import GFEX_XDROP, ScoreThreshold
from lastz_tpu.core.encoding import UPPER_NUC_TO_BITS
from lastz_tpu.core.scoring import new_dna_score_set
from lastz_tpu.core.seeds import parse_seed
from lastz_tpu.index.postable import build_seed_position_table
from lastz_tpu.index.sharded import (
    build_sharded_position_table, shard_bounds)
from lastz_tpu.search.engine import HitProcessorParams, SeedSearchEngine


def _seqs(n=30000, seed=5):
    rng = np.random.default_rng(seed)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    s1 = alpha[rng.integers(0, 4, n)]
    s2 = s1[2000:7000].copy()
    mut = rng.random(len(s2)) < 0.12
    s2[mut] = alpha[rng.integers(0, 4, mut.sum())]
    # embed a second copy from near a shard border
    return s1, s2


@pytest.mark.parametrize("n_shards,step", [(2, 1), (4, 1), (3, 5)])
def test_sharded_equals_unsharded_index(n_shards, step):
    s1, _ = _seqs()
    seed = parse_seed("1110100110010101111", with_trans=1)
    full = build_seed_position_table(
        s1, 0, 0, UPPER_NUC_TO_BITS, seed, step)
    sh = build_sharded_position_table(
        s1, UPPER_NUC_TO_BITS, seed, step, n_shards)
    assert len(sh.shards) == n_shards
    merged = sh.as_merged()
    np.testing.assert_array_equal(
        np.asarray(full.csr_start, np.int64),
        np.asarray(merged.csr_start, np.int64))
    np.testing.assert_array_equal(
        full.adj_start + full.step * full.csr_pos.astype(np.int64),
        merged.adj_start + merged.step * merged.csr_pos.astype(np.int64))
    # probe order (descending last/prev walk) must match per word
    counts = full.counts()
    for w in np.nonzero(counts)[0][:50]:
        np.testing.assert_array_equal(
            full.positions_for(int(w)), sh.positions_for(int(w)))


def test_sharded_bounds_partition():
    b = shard_bounds(1000, 3, 19)
    assert b[0] == 18 and b[-1] == 1000
    assert all(b[i] < b[i + 1] for i in range(3))


def _search_hits(s1, s2, pt):
    sc = new_dna_score_set()
    hp = HitProcessorParams(
        gf_extend=GFEX_XDROP, scoring=sc, x_drop=910,
        hsp_threshold=ScoreThreshold("S", 3000))
    hits = []
    eng = SeedSearchEngine(
        s1, pt, s2, pt.seed, UPPER_NUC_TO_BITS, hp,
        lambda p1, p2, ln, s: hits.append((p1, p2, ln, s)) or ln)
    eng.search(0, len(s2))
    return hits


def test_sharded_search_equals_unsharded():
    s1, s2 = _seqs()
    seed = parse_seed("1110100110010101111", with_trans=1)
    full = build_seed_position_table(
        s1, 0, 0, UPPER_NUC_TO_BITS, seed, 1)
    sh = build_sharded_position_table(
        s1, UPPER_NUC_TO_BITS, seed, 1, 4)
    ref = _search_hits(s1, s2, full)
    got = _search_hits(s1, s2, sh.as_merged())
    assert len(ref) > 0
    assert got == ref
