#!/usr/bin/env python
"""Chromosome-scale e2e scaling bench (VERDICT r3 item 2).

The reference's defining workload is a chromosome pair (191 Mbp vs
94 Mbp, ~4.5 h at default sensitivity — README.lastz.html Figure 1(b);
BASELINE.md row 2).  This script benches ours vs the reference C
binary on the same synthetic conserved-segment pairs as bench.py but
at a ladder of sizes, recording e2e wall clock, stage timers, peak
RSS for BOTH binaries, and LAV equivalence at every rung.  Results go
to SCALING_r04.json, which bench.py embeds into its artifact.

Usage:
  python bench_scaling.py                    # default ladder 4/12/40 Mbp
  LASTZ_TPU_SCALE_BPS=4000000,40000000 python bench_scaling.py
  python bench_scaling.py worker <t> <q> <out.lav> <runs>   # internal
"""

import json
import os
import resource
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import numpy as np

OUT = os.path.join(REPO, "SCALING_r04.json")
ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)


def make_pair(n, tpath, qpath, seed=42):
    """Same statistical shape as bench.ensure_pair (conserved 2-6 kbp
    segments at 72-85% identity, ~1% ins, ~1% del, random background)
    but fully vectorized so 40+ Mbp generates in seconds."""
    if os.path.exists(tpath) and os.path.exists(qpath):
        return
    rng = np.random.default_rng(seed)
    t = ALPHA[rng.integers(0, 4, n)]

    def mutate(seg, ident):
        m = len(seg)
        out = seg.copy()
        sub = rng.random(m) < (1 - ident)
        out[sub] = ALPHA[rng.integers(0, 4, int(sub.sum()))]
        del_idx = np.nonzero(rng.random(m) < 0.01)[0]
        out = np.delete(out, del_idx)
        ins_idx = np.nonzero(rng.random(len(out)) < 0.01)[0]
        out = np.insert(out, ins_idx,
                        ALPHA[rng.integers(0, 4, len(ins_idx))])
        return out

    q_parts = []
    for _ in range(150 * (n // 1_000_000)):
        L = int(rng.integers(2000, 6000))
        p = int(rng.integers(0, n - L))
        f = int(rng.integers(1000, 5000))
        q_parts.append(ALPHA[rng.integers(0, 4, f)])
        ident = 0.72 + 0.13 * rng.random()
        q_parts.append(mutate(t[p:p + L], ident))
    q = np.concatenate(q_parts)

    def write(path, name, s):
        with open(path, "w") as f:
            f.write(">" + name + "\n")
            for i in range(0, len(s), 80):
                f.write(bytes(s[i:i + 80]).decode() + "\n")

    write(tpath, "t", t)
    write(qpath, "q", q)


def run_worker(tpath, qpath, outpath, runs, flags=()):
    """Child process: run our pipeline `runs` times (min wall), then
    report wall/timers/RSS as one JSON line on stdout."""
    os.environ["LASTZ_TPU_DEVICE"] = "0"
    import io

    from lastz_tpu import stats as _stats
    from lastz_tpu.cli import parse_options
    from lastz_tpu.pipeline import Pipeline

    best = None
    timers = {}
    counters = {}
    walls = []
    for _ in range(runs):
        _stats.reset()
        t0 = time.time()
        cfg = parse_options([tpath, qpath, *flags])
        buf = io.StringIO()
        Pipeline(cfg, buf).run()
        dt = time.time() - t0
        walls.append(dt)
        if best is None or dt < best:
            best = dt
            st = _stats.current
            timers = {k: round(v, 2) for k, v in st.timers.items()}
            counters = dict(hsps=int(st.hsps),
                            alignments=int(st.alignments))
            with open(outpath, "w") as f:
                f.write(buf.getvalue())
    print(json.dumps({
        "seconds": round(best, 1),
        "runs": [round(w, 1) for w in walls],
        "timers": timers,
        **counters,
        "peak_rss_mb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024,
            1),
    }))


def run_reference(binpath, tpath, qpath, outpath, flags=()):
    pre = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss
    t0 = time.time()
    with open(outpath, "w") as f:
        subprocess.run([binpath, tpath, qpath, *flags], stdout=f,
                       stderr=subprocess.DEVNULL, check=True)
    dt = time.time() - t0
    post = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss
    return dt, max(post, pre) / 1024.0


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        run_worker(sys.argv[2], sys.argv[3], sys.argv[4],
                   int(sys.argv[5]), tuple(sys.argv[6:]))
        return

    import bench
    binpath = bench.ensure_reference()
    sizes = [int(s) for s in os.environ.get(
        "LASTZ_TPU_SCALE_BPS", "4000000,12000000,40000000").split(",")]
    results = {"generated": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                          time.gmtime()),
               "note": ("synthetic conserved-segment pairs "
                        "(bench.py shape), default sensitivity, "
                        "single run per binary at >=40 Mbp; "
                        "host path (LASTZ_TPU_DEVICE=0)"),
               "rungs": []}
    variants = [("default", ())]
    if os.environ.get("LASTZ_TPU_SCALE_INNER", "1") != "0":
        # interpolation ("tweener") variant at the smallest rung:
        # the full mini-pipeline per inter-alignment window
        # (reference tweener.c:239)
        variants.append(("inner2200", ("--inner=2200",)))
    for size_i, n in enumerate(sizes):
        tag = f"{n // 1_000_000}M"
        tpath = f"/tmp/lastz_scale_{tag}_t.fa"
        qpath = f"/tmp/lastz_scale_{tag}_q.fa"
        sys.stderr.write(f"[scaling] {tag}: generating pair...\n")
        make_pair(n, tpath, qpath)
        runs = 2 if n <= 12_000_000 else 1

        for vname, flags in (variants if size_i == 0
                             else variants[:1]):
            _run_rung(binpath, results, n, tag, tpath, qpath, runs,
                      vname, flags)


def _run_rung(binpath, results, n, tag, tpath, qpath, runs,
              vname, flags):
    sys.stderr.write(f"[scaling] {tag}/{vname}: reference...\n")
    ref_lav = f"/tmp/lastz_scale_{tag}_{vname}_ref.lav"
    ref_s, ref_rss = run_reference(binpath, tpath, qpath, ref_lav,
                                   flags)

    sys.stderr.write(f"[scaling] {tag}/{vname}: ours...\n")
    our_lav = f"/tmp/lastz_scale_{tag}_{vname}_ours.lav"
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "worker",
         tpath, qpath, our_lav, str(runs), *flags],
        capture_output=True, text=True)
    if r.returncode != 0:
        results["rungs"].append(
            {"pair_bp": n, "variant": vname,
             "error": r.stderr[-1500:]})
        save(results)
        return
    ours = json.loads(r.stdout.strip().splitlines()[-1])

    from lastz_tpu.tools.lav_compare import lav_equivalent
    with open(ref_lav) as f1, open(our_lav) as f2:
        same, why = lav_equivalent(f1.read(), f2.read())

    rung = {
        "pair_bp": n,
        "variant": vname,
        "ref_seconds": round(ref_s, 1),
        "ref_peak_rss_mb": round(ref_rss, 1),
        "ours_seconds": ours["seconds"],
        "ours_runs": ours["runs"],
        "ours_peak_rss_mb": ours["peak_rss_mb"],
        "ours_timers": ours["timers"],
        "hsps": ours.get("hsps"),
        "alignments": ours.get("alignments"),
        "speedup_vs_c": round(ref_s / ours["seconds"], 3),
        "lav_equivalent": bool(same),
    }
    if not same:
        rung["lav_diff"] = why[:400]
    results["rungs"].append(rung)
    sys.stderr.write(
        f"[scaling] {tag}/{vname}: ref {ref_s:.0f}s vs ours "
        f"{ours['seconds']:.0f}s ({rung['speedup_vs_c']}x), "
        f"lav_equivalent={same}\n")
    save(results)


def save(results):
    with open(OUT + ".tmp", "w") as f:
        json.dump(results, f, indent=1)
    os.replace(OUT + ".tmp", OUT)


if __name__ == "__main__":
    main()
