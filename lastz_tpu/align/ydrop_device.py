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
DEFAULT_ROWS = int(os.environ.get("LASTZ_TPU_YDROP_ROWS", "1024"))
DEFAULT_LANES = int(os.environ.get("LASTZ_TPU_YDROP_LANES", "0"))
DEFAULT_BATCH = int(os.environ.get("LASTZ_TPU_YDROP_BATCH", "64"))


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
        self.gap_e = int(scoring.gap_extend)
        self.gap_oe = int(scoring.gap_open + scoring.gap_extend)
        if abs(self.gap_oe) >= (1 << 30) or int(y_drop) >= (1 << 30):
            return
        from ..ops.ydrop_exact import make_compact_alphabet
        cmap_sub = make_compact_alphabet([v1, v2], sub, max_k=16)
        if cmap_sub is None:
            return  # exotic alphabet: host only
        self.code_map, self.subsmall = cmap_sub
        # window capacity: must exceed the widest possible band (about
        # 2*yDrop/gapE + drift margin); rows-per-launch is independent
        # because a window-end simply re-anchors the next chunk
        self.lanes = DEFAULT_LANES or (self.width * 2)
        self._results: dict[int, dict] = {}
        self._ops: dict[int, tuple] = {}
        self.ok = True
        self.stats_device = 0
        self.stats_host = 0

    # -- batched chunked kernel invocation -------------------------------

    def _gather_windows(self, entries, row_base, b_off, code_map):
        """Per-chunk window gather (compact-alphabet codes).
        entries: (a1, a2, low1, high1, low2, high2, reversed) per
        lane; lane l of b_win is column b_off + l."""
        R = self.rows
        lanes = self.lanes
        n = len(entries)
        a_win = np.zeros((n, R), np.int32)
        b_win = np.zeros((n, lanes), np.int32)
        v1, v2 = self.v1, self.v2
        for j, (a1, a2, low1, high1, low2, high2, rev) in \
                enumerate(entries):
            lo = int(row_base[j])
            bo = int(b_off[j])
            if not rev:
                src = v1[a1 + 1 + lo: min(a1 + 1 + lo + R, high1)]
                a_win[j, : len(src)] = code_map[src]
                src = v2[a2 + bo: min(a2 + bo + lanes, high2)]
                b_win[j, : len(src)] = code_map[src]
            else:
                src = v1[max(low1, a1 + 1 - lo - R): a1 - lo + 1][::-1]
                a_win[j, : len(src)] = code_map[src]
                # reversed pass: column c reads v2[a2+1-c]; lane l is
                # column bo + l, so lane 0 maps to index a2+1-bo
                # (garbage when bo == 0: column 0 has no character)
                if bo == 0:
                    src = v2[max(low2, a2 + 2 - lanes): a2 + 1][::-1]
                    b_win[j, 1: 1 + len(src)] = code_map[src]
                else:
                    src = v2[max(low2, a2 + 2 - bo - lanes):
                             a2 + 2 - bo][::-1]
                    b_win[j, : len(src)] = code_map[src]
        return a_win, b_win

    _MAX_CHUNKS = 4096
    _MAX_TB_CHUNKS = 8

    def _compute_batch(self, start):
        import jax.numpy as jnp
        from ..ops.ydrop_exact import fresh_state_np, ydrop_chunk

        idxs = list(range(start, min(start + self.batch,
                                     len(self.seg_infos))))
        B = self.batch
        lanes = self.lanes
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
            int(self.y_drop), lanes, 2 * B)
        state = {k: jnp.asarray(v) for k, v in st_np.items()}
        # per-chunk: (tb handle, row_lo (2B,), row_hi (2B,), col0 (2B,))
        chunk_infos: list[tuple] = []
        prev_off = np.zeros(2 * B, np.int64)
        prev_used = np.zeros(2 * B, np.int64)
        chunk = 0
        fetch = self._fetch_scalars
        row_np, ly_np, used_np, done_np, _ = fetch(state)
        while True:
            row_base = row_np.astype(np.int64) - 1
            b_off = np.where(done_np, prev_off, ly_np.astype(np.int64))
            shift = (b_off - prev_off).astype(np.int32)
            prev_off = b_off.copy()
            a_win, b_win = self._gather_windows(
                entries, row_base, b_off, self.code_map)
            state, tb = ydrop_chunk(
                jnp.asarray(a_win), jnp.asarray(b_win),
                jnp.asarray(b_off.astype(np.int32)),
                jnp.asarray(shift),
                jnp.asarray(M), jnp.asarray(N),
                state, jnp.asarray(self.subsmall),
                gap_e=self.gap_e, gap_oe=self.gap_oe,
                y_drop=int(self.y_drop),
                lanes=lanes, rows=self.rows,
                alpha=self.subsmall.shape[0],
                trim_to_peak=self.trim_to_peak, tb_cap=self.tb_cap)
            row_np, ly_np, used_np, done_np, _ = fetch(state)
            if chunk < self._MAX_TB_CHUNKS:
                chunk_infos.append((tb, row_base + 1, used_np.copy(),
                                    b_off.copy()))
            prev_used = used_np.astype(np.int64)
            chunk += 1
            if done_np.all() or chunk >= self._MAX_CHUNKS:
                break

        small = {k: np.asarray(v) for k, v in state.items()
                 if k not in ("CC", "DD")}
        small["score"] = np.where(small["bflag"], small["bscore"],
                                  small["best"])

        ops_all, ops_ok = self._walk_traceback(
            chunk_infos, small, row0_links)

        for j, ix in enumerate(idxs):
            fwd = {k: small[k][j] for k in small}
            rev = {k: small[k][B + j] for k in small}
            fwd["ops_ok"] = bool(ops_ok[j])
            rev["ops_ok"] = bool(ops_ok[B + j])
            self._results[ix] = {"fwd": fwd, "rev": rev}
            self._ops[ix] = (ops_all[j], ops_all[B + j])

    @staticmethod
    def _fetch_scalars(state):
        """One packed transfer of the per-lane loop scalars."""
        import jax.numpy as jnp
        packed = np.asarray(jnp.stack([
            state["row"], state["LY"], state["rows_used"],
            state["done"].astype(jnp.int32), state["status"]]))
        return (packed[0], packed[1], packed[2],
                packed[3].astype(bool), packed[4])

    def _walk_traceback(self, chunk_infos, small, row0_links):
        """Device-side traceback for the whole batch: walk the chunk
        list backwards with the batched link-walker, fetching only the
        op-code segments (ops/ydrop_exact.py traceback_chunk_dev)."""
        import jax.numpy as jnp
        from ..ops.ydrop_exact import OP_I, traceback_chunk_dev

        nb = len(small["end1"])
        cap = self.rows + self.lanes + 512
        row = small["end1"].astype(np.int32).copy()
        col = small["end2"].astype(np.int32).copy()
        prev = np.zeros(nb, np.int32)
        segs: list[list] = [[] for _ in range(nb)]
        ops_ok = np.ones(nb, bool)
        code = {1: "S", 2: "I", 3: "D"}
        for (tb, row_lo, row_hi, col0) in reversed(chunk_infos):
            if not ((row >= np.minimum(row_lo, 1)) & (row <= row_hi)
                    & ((row >= 1) | (col > 0))).any():
                continue
            ops_d, n_d, row_d, col_d, prev_d = traceback_chunk_dev(
                tb, jnp.asarray(col0.astype(np.int32)),
                jnp.asarray(row_lo.astype(np.int32)),
                jnp.asarray(row_hi.astype(np.int32)),
                jnp.asarray(row), jnp.asarray(col),
                jnp.asarray(prev), cap=cap)
            packed = np.asarray(jnp.concatenate([
                row_d[None].astype(jnp.int32),
                col_d[None].astype(jnp.int32),
                prev_d[None].astype(jnp.int32), n_d[None]]))
            ops_np = np.asarray(ops_d)
            row, col, prev, n_np = (packed[0], packed[1], packed[2],
                                    packed[3])
            ops_ok &= n_np < cap
            for j in range(nb):
                if n_np[j]:
                    segs[j].append(ops_np[j, : n_np[j]])
        # walks must have terminated (row<=0 and col<=0); anything
        # still live ran past the retained chunks -> host fallback
        ops_ok &= ~((row >= 1) | (col > 0))
        ops_all = []
        for j in range(nb):
            if segs[j]:
                cat = np.concatenate(segs[j])
                ops_all.append([code[int(c)] for c in cat])
            else:
                ops_all.append([])
        return ops_all, ops_ok

    def result_for(self, ix):
        if ix not in self._results:
            self._compute_batch((ix // self.batch) * self.batch)
        return self._results[ix]

    def release(self, ix):
        """Drop an anchor's cached result/ops (host-side; the device
        traceback buffers are freed at the end of each batch)."""
        self._results.pop(ix, None)
        self._ops.pop(ix, None)

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
            if not res[w]["ops_ok"]:
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

        ops_fwd, ops_rev = self._ops[ix]
        ops_left = ops_rev
        start1 = anchor1 + 1 - int(rev["end1"])
        start2 = anchor2 + 1 - int(rev["end2"])

        ops_right = ops_fwd
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
        if not aligner.report_truncations:
            return  # --notruncationreport
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
