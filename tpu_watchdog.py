#!/usr/bin/env python
"""Accelerator tunnel watchdog.

The TPU in this environment sits behind a tunnel that is frequently
dead (`jax.devices()` hangs forever).  This supervisor polls the chip
with a timeout-guarded SUBPROCESS probe (never hanging the parent) and
the moment the chip answers it launches tpu_evidence.py, which captures
all on-chip kernel validations/benchmarks into TPU_EVIDENCE.json.

Every probe attempt — alive or dead — is appended to
TPU_EVIDENCE.json's "probes" list so the artifact documents exactly
when the chip was reachable.

Usage:  python tpu_watchdog.py [--interval SECONDS] [--once]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(REPO, "TPU_EVIDENCE.json")

PROBE_SRC = r"""
import os, sys, time
os.environ.pop("JAX_PLATFORMS", None)
import jax, jax.numpy as jnp
devs = jax.devices()
if devs[0].platform == "cpu":
    print("PLATFORM cpu"); sys.exit(3)
t0 = time.time()
x = jnp.ones((128, 128))
(x @ x).block_until_ready()
print(f"PLATFORM {devs[0].platform} RTT {time.time()-t0:.2f}")
"""


def _now():
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())


def load():
    if os.path.exists(OUT):
        with open(OUT) as f:
            return json.load(f)
    return {"probes": [], "stages": {}}


def save(ev):
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(ev, f, indent=1, sort_keys=True)
    os.replace(tmp, OUT)


def probe(timeout_s: float = 150.0):
    """Returns (alive, detail_str, seconds)."""
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, "-c", PROBE_SRC],
            capture_output=True, text=True, timeout=timeout_s)
        dt = time.time() - t0
        out = (r.stdout or "").strip().splitlines()
        tail = out[-1] if out else (r.stderr or "").strip()[-200:]
        return r.returncode == 0, tail, dt
    except subprocess.TimeoutExpired:
        return False, f"probe timeout ({timeout_s:.0f}s)", \
            time.time() - t0


def run_evidence(timeout_s: float = 7200.0) -> bool:
    """Launch the evidence capture; stream stderr to our log."""
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tpu_evidence.py")],
            timeout=timeout_s)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        sys.stderr.write("[watchdog] evidence run timed out\n")
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", type=float, default=600.0)
    ap.add_argument("--once", action="store_true")
    args = ap.parse_args()
    while True:
        alive, detail, dt = probe()
        ev = load()
        ev["probes"].append({
            "ts": _now(), "alive": alive,
            "seconds": round(dt, 1), "detail": detail})
        # keep the probe log bounded
        ev["probes"] = ev["probes"][-200:]
        save(ev)
        sys.stderr.write(
            f"[watchdog] {_now()} alive={alive} ({dt:.0f}s) "
            f"{detail}\n")
        if alive:
            ok = run_evidence()
            ev = load()
            if ok and ev.get("complete"):
                sys.stderr.write("[watchdog] evidence complete\n")
                return 0
            # partial capture: keep polling, retry what failed
        if args.once:
            return 0 if alive else 1
        time.sleep(args.interval)


if __name__ == "__main__":
    sys.exit(main())
