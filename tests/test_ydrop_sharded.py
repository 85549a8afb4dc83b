"""Gapped (y-drop) extension over the mesh-sharded target
(align/ydrop_sharded.py): per-launch read-band windows extracted
shard-locally must reproduce the whole-target device kernel
lane-for-lane — scores, end points, traceback ops — with no device
ever holding the whole target's codes (the gapped half of the
lastz_32/40 beyond-address-space tier, reference src/Makefile:19-25).
"""

import numpy as np
import pytest

from lastz_tpu.core.encoding import UPPER_NUC_TO_BITS
from lastz_tpu.core.scoring import new_dna_score_set
from lastz_tpu.core.seeds import parse_seed

jax = pytest.importorskip("jax")

SEED19 = "1110100110010101111"


def _seqs(n=30000, seed=7):
    rng = np.random.default_rng(seed)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    s1 = alpha[rng.integers(0, 4, n)]
    # a long mutated homology so extensions run thousands of rows
    # (forcing continuation launches and window re-extraction), plus
    # an exact copy crossing the 4-shard borders (~7.5k/15k/22.5k)
    s2m = s1[2000:9000].copy()
    mut = rng.random(len(s2m)) < 0.10
    s2m[mut] = alpha[rng.integers(0, 4, mut.sum())]
    s2 = np.concatenate(
        [alpha[rng.integers(0, 4, 400)], s2m,
         s1[13000:18000].copy(), alpha[rng.integers(0, 4, 600)]])
    return s1, s2


def _index(s1, n_shards=4, halo=2048):
    from lastz_tpu.search.sharded_mesh import MeshShardedIndex
    sc = new_dna_score_set()
    seed = parse_seed(SEED19, with_trans=1)
    return MeshShardedIndex(
        s1, UPPER_NUC_TO_BITS, seed, 1, n_shards, sc.sub,
        ext_halo=halo)


def test_extract_windows_matches_direct():
    """Owner-gathered windows == direct slices of the coded target,
    including windows that straddle shard borders and sit inside the
    halo of a neighboring shard."""
    from lastz_tpu.align.ydrop_sharded import extract_target_windows
    s1, _ = _seqs()
    index = _index(s1)
    # no device holds the whole target
    assert ((index.res_hi - index.res_lo) < len(s1)).all()
    codes = index.code_map[s1].astype(np.int8)
    n = len(s1)
    Wt = 520
    rng = np.random.default_rng(3)
    lo = np.concatenate([
        rng.integers(0, n - Wt, 24),
        np.array([0, n - Wt]),                    # sequence edges
        np.array([7500 - Wt // 2, 15000 - Wt // 2,
                  22500 - Wt // 2, 7499, 14999]),  # border straddles
    ]).astype(np.int64)
    for keys in (lo, np.minimum(lo + Wt - 1, n - 1)):  # fwd/rev keys
        got = np.asarray(extract_target_windows(
            index, lo, keys.astype(np.int64), Wt))
        want = np.stack([codes[int(p): int(p) + Wt] for p in lo])
        np.testing.assert_array_equal(got, want)


def _both(s1, s2, seg_infos, rows=64, width=768, batch=4,
          halo=2048):
    from lastz_tpu.align.ydrop_device import DeviceYDrop
    from lastz_tpu.align.ydrop_sharded import ShardedTargetYDrop
    sc = new_dna_score_set()
    y_drop = 3400
    tbmem = 80 << 20
    whole = DeviceYDrop(s1, s2, sc, y_drop, False, tbmem,
                        list(seg_infos), width=width, rows=rows,
                        batch=batch)
    assert whole.ok
    index = _index(s1, halo=halo)
    shard = ShardedTargetYDrop(index, s1, s2, sc, y_drop, False,
                               tbmem, list(seg_infos), width=width,
                               rows=rows, batch=batch)
    return whole, shard


def test_sharded_gapped_equals_whole_target():
    s1, s2 = _seqs()
    # anchors inside the mutated homology (long two-sided extensions)
    # and inside the exact border-crossing copy; whole-sequence bounds
    seg_infos = []
    for (a1, a2) in [(2600, 1000), (5000, 3400), (8500, 6900),
                     (14000, 8400), (16800, 11200)]:
        seg_infos.append((a1, a2, 0, len(s1), 0, len(s2)))
    whole, shard = _both(s1, s2, seg_infos)
    assert shard.ok
    for k in range(len(seg_infos)):
        rw = whole.result_for(k)
        rs = shard.result_for(k)
        assert rw is not None and rs is not None
        for side in ("fwd", "rev"):
            for key in rw[side]:
                assert np.all(rw[side][key] == rs[side][key]), (
                    k, side, key, rw[side][key], rs[side][key])
        assert whole._ops[k] == shard._ops[k], k
    # the homology extensions are long enough to need continuation
    # launches, so window re-extraction ran with advanced rows
    assert int(np.asarray(whole._results[0]["fwd"]["row"])) > \
        whole.max_blocks * whole.rows


def test_sharded_gapped_rejects_small_halo():
    """Residency halo narrower than one launch's read band must be
    refused (ok=False), not silently mis-extract."""
    s1, s2 = _seqs(n=24000, seed=9)
    seg = [(5000, 1000, 0, len(s1), 0, len(s2))]
    _, shard = _both(s1, s2, seg, rows=256, halo=512)
    assert not shard.ok
