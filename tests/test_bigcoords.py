"""Wide-index coordinates (VERDICT round-1 item 9; reference
lastz_32/lastz_40 builds, src/Makefile:19-25): sequences whose
coordinates exceed 2^31 flow through the position table, the seed
search, gapped extension and the output writers without truncation.
Positions are int64 on the host path by construction; this pins it."""

import io

import numpy as np

from lastz_tpu.align.segments import SegmentTable
from lastz_tpu.config import Config, ScoreThreshold
from lastz_tpu.core.encoding import UPPER_NUC_TO_BITS
from lastz_tpu.core.scoring import new_dna_score_set, masked_score_set
from lastz_tpu.core.seeds import parse_seed
from lastz_tpu.index.postable import build_seed_position_table
from lastz_tpu.io.sequence import Sequence
from lastz_tpu.out.dispatcher import OutputDispatcher
from lastz_tpu.search.engine import (HitProcessorParams,
                                     SeedSearchEngine)

BIG = (1 << 31) + 12345  # origin-1 start beyond the 32-bit signed range


def _make_pair():
    rng = np.random.default_rng(17)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    t = alpha[rng.integers(0, 4, 5000)]
    q = t[1000:3000].copy()
    mut = rng.random(len(q)) < 0.05
    q[mut] = alpha[rng.integers(0, 4, mut.sum())]
    target = Sequence(v=t, filename="big_t.fa", header=">chrT",
                      short_header="chrT", start_loc=BIG,
                      true_len=BIG + len(t) + 1000)
    query = Sequence(v=q, filename="big_q.fa", header=">chrQ",
                     short_header="chrQ", start_loc=BIG + 777,
                     true_len=BIG + len(q) + 1000)
    return target, query


def test_big_coordinates_end_to_end():
    target, query = _make_pair()
    seed = parse_seed("1110100110010101111", with_trans=1)
    scoring = new_dna_score_set()
    masked = masked_score_set(scoring)

    pt = build_seed_position_table(target.v, 0, 0, UPPER_NUC_TO_BITS,
                                   seed, 1)
    anchors = SegmentTable()
    params = HitProcessorParams(
        scoring=masked, x_drop=910,
        hsp_threshold=ScoreThreshold("S", 3000))

    def reporter(pos1, pos2, length, s):
        anchors.add(pos1 - length, pos2 - length, length, s, 0)
        return length

    eng = SeedSearchEngine(target.v, pt, query.v, seed,
                           UPPER_NUC_TO_BITS, params, reporter)
    eng.search(0, len(query.v))
    assert len(anchors) > 0

    from lastz_tpu.align.ydrop import gapped_extend, reduce_to_points
    reduce_to_points(target.v, query.v, scoring, anchors)
    aligns = gapped_extend(target, query, scoring, anchors,
                           y_drop=9400,
                           score_thresh=ScoreThreshold("S", 3000))
    assert aligns

    cfg = Config()
    cfg.scoring = scoring
    cfg.masked_scoring = masked
    cfg.seed = seed
    cfg.output_format = "general"
    from lastz_tpu.out.genpaf import parse_genpaf_keys
    cfg.output_info = parse_genpaf_keys(
        "name1,start1,end1,name2,start2,end2,score")
    buf = io.StringIO()
    disp = OutputDispatcher(cfg, buf)
    disp.set_sequences(target, query)
    disp.init_for_query()
    disp.init_for_strand()
    disp.print_align_list(aligns)
    rows = [l.split("\t") for l in buf.getvalue().splitlines()
            if l and not l.startswith("#")]
    assert rows
    for r in rows:
        s1, e1 = int(r[1]), int(r[2])
        s2, e2 = int(r[4]), int(r[5])
        # output coordinates carry the >2^31 origins exactly
        assert s1 > (1 << 31) and e1 > (1 << 31)
        assert s2 > (1 << 31) and e2 > (1 << 31)
        assert s1 - BIG < 6000 and s2 - (BIG + 777) < 6000
