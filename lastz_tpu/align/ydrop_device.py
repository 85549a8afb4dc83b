"""Device-batched gapped extension: glue between the exact y-drop
kernel (ops/ydrop_exact.py) and the sequential accept loop of
gapped_extend (align/ydrop.py; reference gapped_extend.c:1012).

Anchors are extended speculatively on device in score order (both
directions batched in one kernel call), UNCONSTRAINED by previous
alignments.  The accept loop then takes each anchor's device result
only when it is provably identical to what the constrained host DP
would produce:

  * the anchor has no bounding segments (msp_left_right found nothing
    on either side), AND
  * no previously accepted alignment's bounding box intersects the
    rectangle the device DP actually explored (expanded by 1).

Masking/bounding only ever REMOVES cells, so the constrained DP
explores a subset of the unconstrained region; if nothing the
constrained pass could see lies in that region, the two are
cell-for-cell identical.  Anything else — bounded anchors, window
overflows, unconverged rows, double-typed scores — falls back to the
host engine for that anchor.  Exactness is never sacrificed; the
device simply takes the (dominant) independent share of the work.
"""

from __future__ import annotations

import os
import sys

import numpy as np

from ..core.scoring import NEG_INFINITY_SCORE

DEFAULT_WIDTH = int(os.environ.get("LASTZ_TPU_YDROP_WIDTH", "768"))
DEFAULT_ROWS = int(os.environ.get("LASTZ_TPU_YDROP_ROWS", "1536"))
DEFAULT_BATCH = int(os.environ.get("LASTZ_TPU_YDROP_BATCH", "32"))


def device_enabled() -> bool:
    return os.environ.get("LASTZ_TPU_DEVICE", "") not in ("", "0")


class DeviceYDrop:
    """Per-strand batched extension cache over a sorted anchor list."""

    def __init__(self, v1, v2, scoring, y_drop, trim_to_peak,
                 traceback_mem, seg_infos,
                 width=None, rows=None, batch=None):
        """seg_infos: list of (anchor1, anchor2, low1, high1, low2,
        high2) in accept order (decreasing score)."""
        self.ok = False
        self.v1 = v1
        self.v2 = v2
        self.trim_to_peak = trim_to_peak
        self.width = width or DEFAULT_WIDTH
        self.rows = rows or DEFAULT_ROWS
        self.batch = batch or DEFAULT_BATCH
        self.tb_cap = int(traceback_mem)
        self.seg_infos = seg_infos
        self.y_drop = y_drop

        from ..ops.ydrop_exact import MAX_COMP_GAP_E
        if scoring.sub.dtype != np.int64:
            return  # double scores: host only
        if not (0 <= scoring.gap_extend <= MAX_COMP_GAP_E):
            return
        sub = scoring.sub
        if sub.shape != (256, 256):
            return
        if np.abs(sub).max() >= (1 << 31):
            return
        self.sub32 = sub.astype(np.int32)
        self.gap_e = int(scoring.gap_extend)
        self.gap_oe = int(scoring.gap_open + scoring.gap_extend)
        if abs(self.gap_oe) >= (1 << 30) or int(y_drop) >= (1 << 30):
            return
        self._results: dict[int, dict] = {}
        self._dev_tb: dict[int, tuple] = {}
        self.ok = True
        self.stats_device = 0
        self.stats_host = 0

    # -- batched chunked kernel invocation -------------------------------

    def _gather_windows(self, entries, row_base, b_off):
        """Per-chunk window gather.  entries: list of (a1, a2, low1,
        high1, low2, high2, reversed) per lane."""
        R, W = self.rows, self.width
        b_cap = R + W
        n = len(entries)
        a_win = np.zeros((n, R), np.int32)
        b_win = np.zeros((n, b_cap), np.int32)
        v1, v2 = self.v1, self.v2
        for j, (a1, a2, low1, high1, low2, high2, rev) in \
                enumerate(entries):
            lo = int(row_base[j])
            bo = int(b_off[j])
            if not rev:
                src = v1[a1 + 1 + lo: min(a1 + 1 + lo + R, high1)]
                a_win[j, : len(src)] = src
                src = v2[a2 + 1 + bo: min(a2 + 1 + bo + b_cap, high2)]
                b_win[j, : len(src)] = src
            else:
                src = v1[max(low1, a1 + 1 - lo - R): a1 - lo + 1][::-1]
                a_win[j, : len(src)] = src
                src = v2[max(low2, a2 + 1 - bo - b_cap):
                         a2 - bo + 1][::-1]
                b_win[j, : len(src)] = src
        return a_win, b_win

    _MAX_CHUNKS = 4096

    def _compute_batch(self, start):
        import jax.numpy as jnp
        from ..ops.ydrop_exact import fresh_state_np, ydrop_chunk

        idxs = list(range(start, min(start + self.batch,
                                     len(self.seg_infos))))
        B = self.batch
        # lane layout: [fwd x B (padded), rev x B (padded)]
        entries = []
        M = np.zeros(2 * B, np.int32)
        N = np.zeros(2 * B, np.int32)
        for j in range(B):
            if j < len(idxs):
                a1, a2, low1, high1, low2, high2 = \
                    self.seg_infos[idxs[j]]
            else:
                a1 = a2 = low1 = high1 = low2 = high2 = 0
            entries.append((a1, a2, low1, high1, low2, high2, False))
            M[j] = high1 - (a1 + 1)
            N[j] = high2 - (a2 + 1)
        for j in range(B):
            a1, a2, low1, high1, low2, high2, _ = entries[j]
            entries.append((a1, a2, low1, high1, low2, high2, True))
            if j < len(idxs):
                M[B + j] = (a1 + 1) - low1
                N[B + j] = (a2 + 1) - low2

        st_np, row0_links = fresh_state_np(
            N.astype(np.int64), self.gap_e, self.gap_oe,
            int(self.y_drop), self.width, 2 * B)
        state = {k: jnp.asarray(v) for k, v in st_np.items()}
        tb_parts: list[list] = [[] for _ in range(2 * B)]
        chunk = 0
        while True:
            row_base = np.asarray(state["row"]) - 1
            b_off = np.asarray(state["LY"])
            a_win, b_win = self._gather_windows(entries, row_base, b_off)
            state, tb, ly = ydrop_chunk(
                jnp.asarray(a_win), jnp.asarray(b_win),
                jnp.asarray(b_off), jnp.asarray(row_base),
                jnp.asarray(M), jnp.asarray(N),
                state, jnp.asarray(self.sub32),
                gap_e=self.gap_e, gap_oe=self.gap_oe,
                y_drop=int(self.y_drop),
                width=self.width, rows=self.rows,
                trim_to_peak=self.trim_to_peak, tb_cap=self.tb_cap)
            rows_used = np.asarray(state["rows_used"])
            done = np.asarray(state["done"])
            for j in range(2 * B):
                if chunk == 0 or rows_used[j] > row_base[j]:
                    tb_parts[j].append((int(row_base[j]), tb, ly, j))
            chunk += 1
            if done.all() or chunk >= self._MAX_CHUNKS:
                break

        small = {k: np.asarray(v) for k, v in state.items()
                 if k not in ("CC", "DD")}
        small["score"] = np.where(small["bflag"], small["bscore"],
                                  small["best"])
        for j, ix in enumerate(idxs):
            fwd = {k: small[k][j] for k in small}
            rev = {k: small[k][B + j] for k in small}
            self._results[ix] = {"fwd": fwd, "rev": rev}
            self._dev_tb[ix] = (tb_parts[j], row0_links[j],
                                tb_parts[B + j], row0_links[B + j])

    def result_for(self, ix):
        if ix not in self._results:
            self._compute_batch((ix // self.batch) * self.batch)
        return self._results[ix]

    def tb_for(self, ix, which):
        """Assemble the contiguous (rows_used+1, W) tb/ly matrices for
        one anchor direction from its chunk list."""
        parts_f, row0_f, parts_r, row0_r = self._dev_tb[ix]
        parts, row0 = ((parts_f, row0_f) if which == "fwd"
                       else (parts_r, row0_r))
        rows_used = int(self._results[ix][which]["rows_used"])
        W = self.width
        tb_np = np.zeros((rows_used + 1, W), np.uint8)
        ly_np = np.zeros((rows_used + 1,), np.int32)
        tb_np[0] = row0[:W]
        for (base, tb, ly, j) in parts:
            lo = base + 1
            hi = min(rows_used + 1, base + self.rows + 1)
            if hi <= lo:
                continue
            n = hi - lo
            tb_np[lo: hi] = np.asarray(tb[j, 1: 1 + n])
            ly_np[lo: hi] = np.asarray(ly[j, 1: 1 + n])
        return tb_np, ly_np

    # -- safety ----------------------------------------------------------

    def explored_rect(self, ix):
        """Sequence-coordinate rectangle the device DP touched, both
        directions, expanded by 1 (for the L/R bound column offsets)."""
        res = self._results[ix]
        a1, a2 = self.seg_infos[ix][0], self.seg_infos[ix][1]
        rf = int(res["fwd"]["rows_used"])
        cf = int(res["fwd"]["maxRY"])
        rr = int(res["rev"]["rows_used"])
        cr = int(res["rev"]["maxRY"])
        return (a1 - rr - 1, a1 + rf + 1, a2 - cr - 1, a2 + cf + 1)

    def statuses_ok(self, ix):
        from ..ops.ydrop_exact import ST_TRUNCATED
        res = self._results[ix]
        for w in ("fwd", "rev"):
            st = int(res[w]["status"])
            if st & ~ST_TRUNCATED:
                return False
        return True

    # -- composing a device alignment ------------------------------------

    def compose(self, aligner, ix, anchor1, anchor2):
        """Replicates YDropAligner.ydrop_align from device results
        (align/ydrop.py:746; gapped_extend.c:2459)."""
        from ..ops.ydrop_exact import ST_TRUNCATED, traceback_ops
        from .edit_script import EditScript

        res = self.result_for(ix)
        rev, fwd = res["rev"], res["fwd"]

        self._maybe_report_truncation(aligner, rev, True,
                                      anchor1, anchor2)
        self._maybe_report_truncation(aligner, fwd, False,
                                      anchor1, anchor2)

        tb, ly = self.tb_for(ix, "rev")
        ops_left = traceback_ops(tb, ly, rev["end1"], rev["end2"])
        start1 = anchor1 + 1 - int(rev["end1"])
        start2 = anchor2 + 1 - int(rev["end2"])

        tb, ly = self.tb_for(ix, "fwd")
        ops_right = traceback_ops(tb, ly, fwd["end1"], fwd["end2"])
        stop1 = anchor1 + int(fwd["end1"])
        stop2 = anchor2 + int(fwd["end2"])

        script = EditScript()
        for op in ops_left:
            script.add(op, 1)
        for op in reversed(ops_right):
            script.add(op, 1)

        s = int(rev["score"]) + int(fwd["score"])
        if script.ops:
            if script.ops[0][0] != "S":
                start1, start2, s = aligner._lop_initial(
                    script, start1, start2)
            if script.ops and script.ops[-1][0] != "S":
                stop1, stop2, s = aligner._lop_final(
                    script, start1, start2, stop1, stop2)
        return s, start1, start2, stop1, stop2, script

    def _maybe_report_truncation(self, aligner, res, reversed_,
                                 anchor1, anchor2):
        from ..ops.ydrop_exact import ST_TRUNCATED
        if not (int(res["status"]) & ST_TRUNCATED):
            return
        end1, end2 = int(res["end1"]), int(res["end2"])
        if not reversed_:
            sys.stderr.write(
                f"truncating alignment ending at ({end1 + anchor1 + 1}"
                f",{end2 + anchor2 + 1});")
        else:
            sys.stderr.write(
                f"truncating alignment starting at ({anchor1 + 2 - end1}"
                f",{anchor2 + 2 - end2});")
        sys.stderr.write(f"  anchor at ({anchor1},{anchor2})\n")
        if not aligner.truncation_reported:
            aligner.truncation_reported = True
            sys.stderr.write(
                "truncation can be reduced by increasing traceback"
                " memory\n")
