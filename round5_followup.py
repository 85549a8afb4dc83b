#!/usr/bin/env python
"""End-of-round follow-ups, run AFTER the scaling ladder exits:

1. re-run the 4 Mbp inner2200 rung on an idle host (the recorded one
   was inflated ~70% by a concurrent compile storm on this 1-core
   box) and replace it in SCALING_r05.json;
2. a second strict on-chip evidence pass (tpu_evidence.py appends to
   the strict_passes history — VERDICT r4 item 1 asked for >=2).
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def ladder_running():
    r = subprocess.run(["ps", "ax", "-o", "args="],
                       capture_output=True, text=True)
    return any("bench_scaling.py" in ln and "followup" not in ln
               for ln in r.stdout.splitlines())


def main():
    while ladder_running():
        sys.stderr.write("[followup] ladder still running...\n")
        time.sleep(60)
    sys.stderr.write("[followup] ladder done; re-running 4M "
                     "inner2200 cleanly\n")

    import bench
    import bench_scaling as bs
    binpath = bench.ensure_reference()
    path = os.path.join(REPO, "SCALING_r05.json")
    with open(path) as f:
        results = json.load(f)
    results["rungs"] = [r for r in results["rungs"]
                        if not (r.get("pair_bp") == 4000000
                                and r.get("variant") == "inner2200")]
    bs.save(results)
    n = 4000000
    tag = "4M"
    tpath = f"/tmp/lastz_scale_{tag}_t.fa"
    qpath = f"/tmp/lastz_scale_{tag}_q.fa"
    bs.make_pair(n, tpath, qpath)
    bs._run_rung(binpath, results, n, tag, tpath, qpath, 2,
                 "inner2200", ("--inner=2200",))
    sys.stderr.write("[followup] inner2200 re-run recorded\n")

    sys.stderr.write("[followup] second strict evidence pass...\n")
    r = subprocess.run([sys.executable,
                        os.path.join(REPO, "tpu_evidence.py"),
                        "--retries", "2"])
    sys.stderr.write(f"[followup] evidence rc={r.returncode}\n")


if __name__ == "__main__":
    main()
