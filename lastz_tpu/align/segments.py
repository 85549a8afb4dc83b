"""Segment (HSP/anchor) tables.

Replicates the behavior of the reference segtable (segment.c:1-500):
a table of (pos1, pos2, length, score, id) with optional score-
coverage limiting implemented as a min-heap — when a coverage budget
('C'/adaptive-K thresholds) is active, the lowest-scoring segments are
evicted once the total covered length exceeds the budget, with ties
kept together (segment.c:5-40).
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field
from typing import Optional

import numpy as np


@dataclass
class Segment:
    pos1: int  # start in target (origin-0)
    pos2: int  # start in query (origin-0)
    length: int
    score: int
    seg_id: int = 0  # strand rcf value
    hsp_id: int = 0
    filter: bool = False
    scale: float = 1.0  # used transiently by chaining

    @property
    def diag(self) -> int:
        return self.pos1 - self.pos2


class SegmentTable:
    def __init__(self, coverage_limit: int = 0):
        self.segments: list[Segment] = []
        self.coverage_limit = coverage_limit  # 0 => no limit
        self.coverage = 0  # total length of contained segments
        self.low_score = 0
        self.have_scores = False
        self._heapified = False

    def __len__(self):
        return len(self.segments)

    def __iter__(self):
        return iter(self.segments)

    # -- insertion with coverage limiting ---------------------------------

    def add(self, pos1, pos2, length, score, seg_id=0, hsp_id=0):
        """reference add_segment (segment.c): append, then if a coverage
        limit is set, evict lowest scores until within budget (keeping
        score ties together)."""
        seg = Segment(pos1, pos2, length, int(score), seg_id, hsp_id)
        if score != 0:
            self.have_scores = True
        if self.coverage_limit == 0:
            self.segments.append(seg)
            self.coverage += length
            if len(self.segments) == 1 or seg.score < self.low_score:
                self.low_score = seg.score
            return
        # heap mode: min-heap by score
        if not self._heapified:
            self._heap = [(s.score, i, s) for i, s in enumerate(self.segments)]
            heapq.heapify(self._heap)
            self._counter = len(self.segments)
            self._heapified = True
        # if below the lowest retained score and budget is full, skip
        heapq.heappush(self._heap, (seg.score, self._counter, seg))
        self._counter += 1
        self.coverage += length
        # evict while over budget, but never break a tie group whose
        # removal would drop below budget... reference semantics: evict
        # lowest-scoring segments while coverage > limit, except that
        # all segments tied with the current root are evicted together
        # only if coverage still exceeds the budget without them.
        while self.coverage > self.coverage_limit and self._heap:
            root_score = self._heap[0][0]
            # gather the tie group
            group = []
            cov_without = self.coverage
            while self._heap and self._heap[0][0] == root_score:
                item = heapq.heappop(self._heap)
                group.append(item)
                cov_without -= item[2].length
            if cov_without >= self.coverage_limit:
                # safe to drop the whole tie group
                self.coverage = cov_without
            else:
                # dropping the group would go under budget: keep it and
                # stop (reference keeps tied scores together)
                for item in group:
                    heapq.heappush(self._heap, item)
                break
        self.segments = [item[2] for item in sorted(self._heap, key=lambda x: x[1])]
        self.low_score = min((s.score for s in self.segments), default=0)

    # -- bulk ops -----------------------------------------------------------

    def sort_by_pos1(self):
        # reference qSegmentsByPos1 ordering
        self.segments.sort(
            key=lambda s: (s.pos1, s.length, s.pos2, s.seg_id, s.score))

    def sort_by_pos2(self):
        # reference qSegmentsByPos2 ordering
        self.segments.sort(
            key=lambda s: (s.pos2, s.length, s.pos1, s.seg_id, s.score))

    def sort_by_decreasing_score(self):
        self.segments.sort(key=lambda s: (-s.score, s.pos1, s.pos2, s.length))

    def sort_by_diag(self):
        self.segments.sort(key=lambda s: (s.diag, s.pos2))

    def merge_overlapping(self):
        """reference merge_segments (segment.c:1527): sort by diagonal
        then pos2; merge strictly-overlapping same-diagonal segments
        (adjoining segments are NOT merged); merged score is the max."""
        if len(self.segments) < 2:
            return
        segs = sorted(self.segments, key=lambda s: (s.diag, s.pos2))
        merged = []
        cur = Segment(segs[0].pos1, segs[0].pos2, segs[0].length,
                      segs[0].score, segs[0].seg_id, segs[0].hsp_id)
        for seg in segs[1:]:
            if seg.diag == cur.diag and seg.pos2 < cur.pos2 + cur.length:
                new_end = max(cur.pos2 + cur.length, seg.pos2 + seg.length)
                cur.length = new_end - cur.pos2
                cur.score = max(cur.score, seg.score)
            else:
                merged.append(cur)
                cur = Segment(seg.pos1, seg.pos2, seg.length,
                              seg.score, seg.seg_id, seg.hsp_id)
        merged.append(cur)
        self.segments = merged
        self.coverage = sum(s.length for s in merged)

    def score_all(self, v1: np.ndarray, v2: np.ndarray, scoring):
        sub = scoring.sub
        for seg in self.segments:
            seg.score = int(
                sub[v1[seg.pos1 : seg.pos1 + seg.length],
                    v2[seg.pos2 : seg.pos2 + seg.length]].sum())
        self.have_scores = True


def read_segment_table(path: str, table: SegmentTable, target, query):
    """Read anchors/segments file (reference read_segment_table,
    segment.c:335-383): lines 'tName tStart tEnd qName qStart qEnd
    strand [score]', origin-1 closed; '*' wildcard name; '#' comments.

    Only records matching the current query name/strand are added.
    """
    qname = query.name_for_output()
    tname = target.name_for_output()
    strand = "-" if (query.rev_comp_flags & 2) else "+"
    qlen = len(query.v)
    with open(path) as f:
        for line in f:
            line = line.split("#")[0].strip()
            if not line:
                continue
            parts = line.split()
            if len(parts) < 7:
                raise ValueError(f"bad segments line: {line}")
            t_name, t_start, t_end, q_name, q_start, q_end, s_strand = parts[:7]
            score = int(parts[7]) if len(parts) > 7 else 0
            if s_strand != strand:
                continue
            if t_name != "*" and t_name != tname:
                continue
            if q_name != "*" and q_name != qname:
                continue
            ts, te = int(t_start), int(t_end)
            qs, qe = int(q_start), int(q_end)
            length = te - ts + 1
            # negative-strand query intervals are counted from the 5'
            # end of the minus strand, which matches our reversed v2
            table.add(ts - 1, qs - 1, length, score,
                      seg_id=query.rev_comp_flags)
    table.have_scores = any(s.score for s in table.segments)
