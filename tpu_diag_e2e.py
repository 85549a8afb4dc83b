#!/usr/bin/env python
"""Diagnose why the device e2e records gapped_device == 0 on the TPU.

Runs a small bench pair with LASTZ_TPU_DEVICE=1 and prints the
dev-skip counters from stats.extra plus any device construction
failure, with stderr surfaced.
"""
import io
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

os.environ.pop("JAX_PLATFORMS", None)
os.environ["LASTZ_TPU_DEVICE"] = "1"
os.environ["LASTZ_TPU_BENCH_BP"] = "1000000"

import bench

bench.TARGET_BP = 1000000
bench.BENCH_T = "/tmp/lastz_tpu_evidence_t.fa"
bench.BENCH_Q = "/tmp/lastz_tpu_evidence_q.fa"
bench.ensure_pair()

import jax
print("backend:", jax.default_backend(), flush=True)

from lastz_tpu import stats as _stats
from lastz_tpu.cli import parse_options
from lastz_tpu.pipeline import Pipeline

_stats.reset()
cfg = parse_options([bench.BENCH_T, bench.BENCH_Q])
buf = io.StringIO()
t0 = time.time()
Pipeline(cfg, buf).run()
dt = time.time() - t0
st = _stats.current
print("wall:", round(dt, 1))
print("gapped_device:", st.gapped_device, "gapped_host:", st.gapped_host)
print("timers:", {k: round(v, 2) for k, v in st.timers.items()})
print("extra:", dict(st.extra))
