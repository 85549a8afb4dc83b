"""Device-resident hit generation (search/device_hits.py +
ops/hitgen.py) must reproduce the scalar engine hit for hit — same
HSPs, same order, same scores — since hit order and the diagonal-hash
drop protocol are observable in golden outputs (SURVEY.md A.2)."""

import io
import os

import numpy as np
import pytest

from lastz_tpu.config import GFEX_NO_EXTEND, GFEX_XDROP, ScoreThreshold
from lastz_tpu.core.encoding import UPPER_NUC_TO_BITS
from lastz_tpu.core.scoring import new_dna_score_set
from lastz_tpu.core.seeds import parse_seed
from lastz_tpu.index.postable import build_seed_position_table
from lastz_tpu.search.engine import HitProcessorParams, SeedSearchEngine


def _related_pair(n, seed=3, ident=0.85):
    rng = np.random.default_rng(seed)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    s1 = alpha[rng.integers(0, 4, n)]
    s2 = s1.copy()
    mut = rng.random(n) < (1 - ident)
    s2[mut] = alpha[rng.integers(0, 4, mut.sum())]
    # shuffle in an unrelated stretch and an N run
    s2[n // 3: n // 3 + n // 10] = alpha[rng.integers(0, 4, n // 10)]
    s2[n // 2: n // 2 + 5] = ord("N")
    return s1, s2


def _collect(s1, s2, seed_str, trans, gf_extend, thresh, x_drop=910,
             env=None, self_compare=False, same_strand=False,
             band=0):
    seed = parse_seed(seed_str, with_trans=trans)
    pt = build_seed_position_table(
        s1, 0, 0, UPPER_NUC_TO_BITS, seed, 1)
    sc = new_dna_score_set()
    hp = HitProcessorParams(
        gf_extend=gf_extend, scoring=sc, x_drop=x_drop,
        hsp_threshold=ScoreThreshold("S", thresh))
    hits = []
    eng = SeedSearchEngine(
        s1, pt, s2, seed, UPPER_NUC_TO_BITS, hp,
        lambda p1, p2, ln, s: hits.append((p1, p2, ln, s)) or ln,
        self_compare=self_compare, same_strand=same_strand,
        band_width=band)
    saved = {}
    env = dict(env or {})
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        eng.search(0, len(s2))
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return hits


SCALAR = {"LASTZ_TPU_SCALAR_SEARCH": "1"}
DEVICE = {"LASTZ_TPU_SCALAR_SEARCH": "0", "LASTZ_TPU_HITGEN": "1",
          "LASTZ_TPU_HIT_BUDGET": str(1 << 15)}


@pytest.mark.parametrize("trans", [0, 1, 2])
def test_device_hits_match_scalar(trans):
    s1, s2 = _related_pair(6000)
    ref = _collect(s1, s2, "1110100110010101111", trans,
                   GFEX_XDROP, 3000, env=SCALAR)
    dev = _collect(s1, s2, "1110100110010101111", trans,
                   GFEX_XDROP, 3000, env=DEVICE)
    assert len(ref) > 0
    assert dev == ref


def test_device_hits_low_threshold_many_chains():
    # low threshold + short seed: dense hits exercise deep hash chains
    s1, s2 = _related_pair(3000, seed=7, ident=0.92)
    ref = _collect(s1, s2, "11111111", 0, GFEX_XDROP, 300, x_drop=300,
                   env=SCALAR)
    dev = _collect(s1, s2, "11111111", 0, GFEX_XDROP, 300, x_drop=300,
                   env=DEVICE)
    assert len(ref) > 50
    assert dev == ref


def test_device_hits_no_extend():
    s1, s2 = _related_pair(2500, seed=5)
    ref = _collect(s1, s2, "111111111111", 0, GFEX_NO_EXTEND, 0,
                   env=SCALAR)
    dev = _collect(s1, s2, "111111111111", 0, GFEX_NO_EXTEND, 0,
                   env=DEVICE)
    assert len(ref) > 0
    assert dev == ref


def test_device_hits_overflow_split():
    # an out-cap small enough to force the overflow/split path
    s1, s2 = _related_pair(2500, seed=5)
    env = dict(DEVICE)
    env["LASTZ_TPU_HIT_OUTCAP"] = "64"
    ref = _collect(s1, s2, "111111111111", 0, GFEX_NO_EXTEND, 0,
                   env=SCALAR)
    dev = _collect(s1, s2, "111111111111", 0, GFEX_NO_EXTEND, 0,
                   env=env)
    assert len(ref) > 64
    assert dev == ref


def test_device_hits_self_same_strand_band():
    s1, _ = _related_pair(3000, seed=9)
    ref = _collect(s1, s1, "1110100110010101111", 1, GFEX_XDROP, 3000,
                   env=SCALAR, self_compare=True, same_strand=True,
                   band=500)
    dev = _collect(s1, s1, "1110100110010101111", 1, GFEX_XDROP, 3000,
                   env=DEVICE, self_compare=True, same_strand=True,
                   band=500)
    assert dev == ref


def test_device_hits_halfweight_seed():
    s1, s2 = _related_pair(4000, seed=13)
    ref = _collect(s1, s2, "TTT0T0TTT0TT0TTTT", 0, GFEX_XDROP, 2000,
                   env=SCALAR)
    dev = _collect(s1, s2, "TTT0T0TTT0TT0TTTT", 0, GFEX_XDROP, 2000,
                   env=DEVICE)
    assert dev == ref


def test_device_position_table_matches_host():
    from lastz_tpu.index.postable import (
        build_seed_position_table, build_seed_position_table_device)
    s1, _ = _related_pair(5000, seed=17)
    seed = parse_seed("1110100110010101111", with_trans=1)
    host = build_seed_position_table(s1, 0, 0, UPPER_NUC_TO_BITS,
                                     seed, 1)
    for step in (1, 3):
        h = build_seed_position_table(s1, 0, 0, UPPER_NUC_TO_BITS,
                                      seed, step)
        d = build_seed_position_table_device(
            s1, 0, 0, UPPER_NUC_TO_BITS, seed, step)
        assert d.n_entries == len(h.csr_pos)
        assert np.array_equal(d.csr_start, h.csr_start)
        assert np.array_equal(d.csr_pos, h.csr_pos)
        assert d.adj_start == h.adj_start


def test_device_search_with_device_pt():
    from lastz_tpu.index.postable import build_seed_position_table_device
    s1, s2 = _related_pair(4000, seed=19)
    seed = parse_seed("1110100110010101111", with_trans=1)
    sc = new_dna_score_set()
    hp = HitProcessorParams(
        gf_extend=GFEX_XDROP, scoring=sc, x_drop=910,
        hsp_threshold=ScoreThreshold("S", 3000))

    def run(pt, env):
        hits = []
        eng = SeedSearchEngine(
            s1, pt, s2, seed, UPPER_NUC_TO_BITS, hp,
            lambda p1, p2, ln, s: hits.append((p1, p2, ln, s)) or ln)
        saved = {}
        for k, v in env.items():
            saved[k] = os.environ.get(k)
            os.environ[k] = v
        try:
            eng.search(0, len(s2))
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        return hits

    from lastz_tpu.index.postable import build_seed_position_table
    ref = run(build_seed_position_table(s1, 0, 0, UPPER_NUC_TO_BITS,
                                        seed, 1), SCALAR)
    dev = run(build_seed_position_table_device(
        s1, 0, 0, UPPER_NUC_TO_BITS, seed, 1), DEVICE)
    assert len(ref) > 0
    assert dev == ref


PALLAS = dict(DEVICE)
PALLAS["LASTZ_TPU_PALLAS"] = "interp"
PALLAS["LASTZ_TPU_HIT_BUDGET"] = str(1 << 12)


def test_pallas_scan_matches_scalar():
    import lastz_tpu.ops.xdrop_pallas as xp
    orig_nb, orig_lm = xp.NB, xp.LMARGIN
    xp.NB, xp.LMARGIN = 512, 2048
    try:
        s1, s2 = _related_pair(4000, seed=23)
        ref = _collect(s1, s2, "1110100110010101111", 1,
                       GFEX_XDROP, 3000, env=SCALAR)
        dev = _collect(s1, s2, "1110100110010101111", 1,
                       GFEX_XDROP, 3000, env=PALLAS)
        assert len(ref) > 0
        assert dev == ref
    finally:
        xp.NB, xp.LMARGIN = orig_nb, orig_lm


def test_pallas_scan_escape_path():
    # tiny margins force window escapes; the wave continuation must
    # finish those scans exactly
    import lastz_tpu.ops.xdrop_pallas as xp
    saved = (xp.NB, xp.LMARGIN, xp.TS_ROWS, xp.QMARGIN)
    xp.NB, xp.LMARGIN, xp.TS_ROWS, xp.QMARGIN = 512, 256, 8, 256
    try:
        s1, s2 = _related_pair(3000, seed=29, ident=0.95)
        ref = _collect(s1, s2, "11111111111", 0, GFEX_XDROP, 1500,
                       env=SCALAR)
        dev = _collect(s1, s2, "11111111111", 0, GFEX_XDROP, 1500,
                       env=PALLAS)
        assert len(ref) > 0
        assert dev == ref
    finally:
        xp.NB, xp.LMARGIN, xp.TS_ROWS, xp.QMARGIN = saved
