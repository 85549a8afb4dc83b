#!/usr/bin/env python
"""Device vs host seed-stage benchmark at amortizing scale (VERDICT
r4 item 3): the dominant stage of the 40 Mbp flagship run is seed
search on the host AVX sweep (79% of wall); this measures the device
hit generator against it at 4 and 12 Mbp with persistent device
arrays, recording per-stage timers and the crossover verdict into
DEVICE_SEED_r05.json (embedded by bench.py).

Method: the same conserved-segment pairs as the scaling ladder
(bench_scaling.make_pair); per size, run the SEED+HSP stage only
(SeedSearchEngine.search over the whole query, collect-HSPs reporter)
once warm for each backend:
  * host:   native AVX sweep (production host path)
  * device: ops/hitgen launches on the attached TPU, strict (no
    silent host fallback), second run timed (first pays compiles)
Hit lists are asserted identical.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import numpy as np

OUT = os.path.join(REPO, "DEVICE_SEED_r05.json")


def load_pair(n):
    from bench_scaling import make_pair
    tag = f"{n // 1_000_000}M"
    tpath = f"/tmp/lastz_scale_{tag}_t.fa"
    qpath = f"/tmp/lastz_scale_{tag}_q.fa"
    make_pair(n, tpath, qpath)
    from lastz_tpu.io.sequence import open_sequence_file
    t = open_sequence_file(tpath).load()
    q = open_sequence_file(qpath).load()
    return t.v, q.v


def run_search(s1, s2, env):
    from lastz_tpu import stats as _stats
    from lastz_tpu.config import GFEX_XDROP, ScoreThreshold
    from lastz_tpu.core.encoding import UPPER_NUC_TO_BITS
    from lastz_tpu.core.scoring import new_dna_score_set
    from lastz_tpu.core.seeds import parse_seed
    from lastz_tpu.index.postable import build_seed_position_table
    from lastz_tpu.search.engine import (
        HitProcessorParams, SeedSearchEngine)

    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        _stats.reset()
        seed = parse_seed("1110100110010101111", with_trans=1)
        t0 = time.time()
        pt = build_seed_position_table(
            s1, 0, 0, UPPER_NUC_TO_BITS, seed, 1)
        t_table = time.time() - t0
        sc = new_dna_score_set()
        hp = HitProcessorParams(
            gf_extend=GFEX_XDROP, scoring=sc, x_drop=910,
            hsp_threshold=ScoreThreshold("S", 3000))
        hits = []
        eng = SeedSearchEngine(
            s1, pt, s2, seed, UPPER_NUC_TO_BITS, hp,
            lambda p1, p2, ln, s: hits.append((p1, p2, ln, s)) or ln)
        t0 = time.time()
        eng.search(0, len(s2))
        t_search = time.time() - t0
        timers = {k: round(v, 2)
                  for k, v in _stats.current.timers.items()}
        return hits, t_table, t_search, timers, pt, eng
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main():
    sizes = [int(s) for s in os.environ.get(
        "LASTZ_TPU_SEED_BPS", "4000000,12000000").split(",") if s]
    import jax
    results = {"generated": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                          time.gmtime()),
               "platform": jax.default_backend(),
               "note": ("SEED+HSP stage only, warm (2nd run) device "
                        "vs host native sweep; same conserved-"
                        "segment pairs as the scaling ladder; hits "
                        "asserted identical"),
               "rungs": []}
    # partial re-runs merge: keep prior rungs for sizes not measured
    # in this invocation
    if os.path.exists(OUT):
        try:
            with open(OUT) as f:
                prior = json.load(f)
            results["rungs"] = [r for r in prior.get("rungs", [])
                                if r.get("pair_bp") not in sizes]
        except Exception:
            pass
    for n in sizes:
        sys.stderr.write(f"[device-seed] {n // 1_000_000}M: pair...\n")
        s1, s2 = load_pair(n)
        host_env = {"LASTZ_TPU_SCALAR_SEARCH": "0",
                    "LASTZ_TPU_HITGEN": "0",
                    "LASTZ_TPU_NATIVE_SEARCH": "1"}
        dev_env = {"LASTZ_TPU_SCALAR_SEARCH": "0",
                   "LASTZ_TPU_HITGEN": "1",
                   "LASTZ_TPU_DEVICE_STRICT": "1"}
        rung = {"pair_bp": n}
        try:
            sys.stderr.write("[device-seed] host run...\n")
            h_hits, h_tab, h_search, h_t, _, _ = run_search(
                s1, s2, host_env)
            sys.stderr.write(
                f"[device-seed] host {h_search:.1f}s, "
                f"{len(h_hits)} hsps; device cold...\n")
            d_hits, d_tab, d_cold, _, _, _ = run_search(
                s1, s2, dev_env)
            sys.stderr.write(
                f"[device-seed] device cold {d_cold:.1f}s; warm...\n")
            d_hits2, _, d_warm, d_t, _, _ = run_search(
                s1, s2, dev_env)
            assert d_hits == h_hits, (
                f"hit mismatch: {len(d_hits)} vs {len(h_hits)}")
            assert d_hits2 == h_hits
            rung.update(
                hsps=len(h_hits),
                host_table_seconds=round(h_tab, 2),
                host_search_seconds=round(h_search, 2),
                device_cold_seconds=round(d_cold, 2),
                device_warm_seconds=round(d_warm, 2),
                device_timers=d_t,
                device_vs_host=round(d_warm / max(h_search, 1e-9), 3),
                hits_identical=True)
        except Exception as e:  # noqa: BLE001 — recorded, not fatal
            import traceback
            rung["error"] = traceback.format_exc(limit=8)[-1200:]
            sys.stderr.write(f"[device-seed] FAILED: {e}\n")
        results["rungs"].append(rung)
        with open(OUT + ".tmp", "w") as f:
            json.dump(results, f, indent=1)
        os.replace(OUT + ".tmp", OUT)
        sys.stderr.write(f"[device-seed] rung recorded: {rung}\n")


if __name__ == "__main__":
    main()
