#!/usr/bin/env python
"""On-chip evidence capture: run the device-kernel validations and
benchmarks on the REAL TPU and record results (with timestamps and
failure reasons) incrementally into TPU_EVIDENCE.json.

Stages (each recorded independently; a later failure never destroys
earlier evidence — the JSON is rewritten after every stage):

  1. probe            — jax.devices() + tiny matmul round-trip
  2. pallas_validate  — exact Pallas y-drop chunk kernel vs the XLA
                        exact kernel, bit-identical state + traceback,
                        ON THE TPU (ops/ydrop_pallas_exact.py)
  3. pallas_rate      — exact-kernel (with traceback) cells/s of the
                        Pallas chunk kernel at production-like shape
  4. xla_mega_rate    — cells/s of the XLA mega-launch exact kernel
  5. hitgen_validate  — device hit generation vs the scalar oracle on
                        the TPU, hit-for-hit identical (STRICT: no
                        silent host fallback)
  6. device_e2e       — small-pair full-pipeline run with
                        LASTZ_TPU_DEVICE=1 (device hit generation +
                        device gapped extension), wall clock + stage
                        timers + LAV equality vs the host-path run

ISOLATION & RETRY: every stage runs in a FRESH SUBPROCESS
(`tpu_evidence.py --stage NAME`), because a TPU worker fault poisons
the client process (and sometimes the worker itself) — observed as
'TPU worker process crashed or restarted' on the NEXT stage even when
that stage's program is sound.  A failed stage is retried up to
--retries times with backoff; every attempt's outcome is recorded.

Run directly (`python tpu_evidence.py`) or via tpu_watchdog.py, which
polls the accelerator tunnel and launches this the moment the chip
answers.
"""

import argparse
import json
import os
import subprocess
import sys
import time
import traceback

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "TPU_EVIDENCE.json")

import numpy as np

STAGE_TIMEOUT = {
    "probe": 600,
    "pallas_validate": 900,
    "pallas_rate": 900,
    "xla_mega_rate": 900,
    "hitgen_validate": 1200,
    "device_e2e": 3600,
}
STAGES = list(STAGE_TIMEOUT)


def _now():
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())


def load_evidence():
    if os.path.exists(OUT):
        with open(OUT) as f:
            return json.load(f)
    return {"probes": [], "stages": {}}


def save_evidence(ev):
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(ev, f, indent=1, sort_keys=True)
    os.replace(tmp, OUT)


class _EnvPatch:
    """Set env vars, restoring prior values (or deletion) on exit."""

    def __init__(self, env: dict):
        self.env = env
        self.saved = {}

    def __enter__(self):
        for k, v in self.env.items():
            self.saved[k] = os.environ.get(k)
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        return self

    def __exit__(self, *exc):
        for k, v in self.saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        return False


# ---------------------------------------------------------------- stages

def stage_probe():
    import jax
    import jax.numpy as jnp
    devs = jax.devices()
    t0 = time.time()
    x = jnp.ones((256, 256), jnp.bfloat16)
    y = (x @ x).block_until_ready()
    rtt = time.time() - t0
    return {
        "platform": devs[0].platform,
        "n_devices": len(devs),
        "device": str(devs[0]),
        "matmul_ok": bool(float(np.asarray(y)[0, 0]) == 256.0),
        "first_matmul_seconds": round(rtt, 2),
    }


def stage_pallas_validate():
    """Exact Pallas chunk kernel vs the XLA exact kernel ON THE TPU:
    every state field and the full traceback buffer must be
    bit-identical (same contract tests/test_ydrop_pallas_exact.py
    proves in interpreter mode)."""
    import jax.numpy as jnp
    from lastz_tpu.core.scoring import new_dna_score_set
    from lastz_tpu.ops.ydrop_exact import (
        fresh_state_np, make_compact_alphabet, ydrop_chunk)
    from lastz_tpu.ops.ydrop_pallas_exact import ydrop_chunk_pallas

    rng = np.random.default_rng(7)
    alpha_b = np.frombuffer(b"ACGT", dtype=np.uint8)
    sc = new_dna_score_set()
    ge = int(sc.gap_extend)
    goe = int(sc.gap_open + sc.gap_extend)
    B, rows, W = 16, 192, 640
    n = rows + W + 64
    s1 = alpha_b[rng.integers(0, 4, n)]
    s2 = s1.copy()
    mut = rng.random(n) < 0.12
    s2[mut] = alpha_b[rng.integers(0, 4, mut.sum())]
    code_map, subsmall = make_compact_alphabet([s1, s2], sc.sub)
    a_win = np.stack([code_map[s1[o:o + rows]]
                      for o in rng.integers(0, 48, B)]).astype(np.int32)
    b_win = np.zeros((B, W), np.int32)
    for b, o in enumerate(rng.integers(0, 48, B)):
        b_win[b, 1:] = code_map[s2[o:o + W - 1]]
    Ms = np.full(B, rows - 2, np.int64)
    Ns = np.full(B, W - 8, np.int64)
    st_np, _ = fresh_state_np(Ns, ge, goe, 9400, W, B)
    state = {k: jnp.asarray(v) for k, v in st_np.items()}
    args = (jnp.asarray(a_win), jnp.asarray(b_win),
            jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32),
            jnp.asarray(Ms, dtype=jnp.int32),
            jnp.asarray(Ns, dtype=jnp.int32), state,
            jnp.asarray(subsmall))
    kw = dict(gap_e=ge, gap_oe=goe, y_drop=9400, lanes=W, rows=rows,
              alpha=subsmall.shape[0], trim_to_peak=True,
              tb_cap=80 << 20)
    t0 = time.time()
    st1, tb1 = ydrop_chunk_pallas(*args, G=8, **kw)
    import jax
    jax.block_until_ready(tb1)
    pallas_t = time.time() - t0
    t0 = time.time()
    st0, tb0 = ydrop_chunk(*args, **kw)
    jax.block_until_ready(tb0)
    xla_t = time.time() - t0
    mismatches = [k for k in st0
                  if not np.array_equal(np.asarray(st0[k]),
                                        np.asarray(st1[k]))]
    tb_equal = bool(np.array_equal(np.asarray(tb0), np.asarray(tb1)))
    if mismatches or not tb_equal:
        raise AssertionError(
            f"pallas/xla mismatch on TPU: state={mismatches} "
            f"tb_equal={tb_equal}")
    return {
        "platform": jax.devices()[0].platform,
        "shape": f"B={B} rows={rows} W={W}",
        "state_fields_identical": sorted(st0.keys()),
        "traceback_identical": tb_equal,
        "pallas_compile_plus_run_seconds": round(pallas_t, 1),
        "xla_compile_plus_run_seconds": round(xla_t, 1),
    }


def stage_pallas_rate():
    import bench
    import jax
    rate, info = bench.pallas_kernel_rate()
    return {
        "platform": jax.devices()[0].platform,
        "exact_kernel_cells_per_sec": round(rate, 1),
        "gcells_per_sec": round(rate / 1e9, 3),
        "note": "validated vs XLA exact kernel in-run before timing",
        **info,
    }


def stage_xla_mega_rate():
    import bench
    import jax
    rate, info = bench.exact_kernel_rate()
    return {
        "platform": jax.devices()[0].platform,
        "exact_kernel_cells_per_sec": round(rate, 1),
        "gcells_per_sec": round(rate / 1e9, 3),
        **info,
    }


def stage_hitgen_validate():
    """Device hit generation vs the scalar oracle, ON THE TPU:
    hit-for-hit identical HSPs, including the diagonal-hash drop
    protocol (SURVEY.md A.2)."""
    import jax
    from lastz_tpu.config import GFEX_XDROP, ScoreThreshold
    from lastz_tpu.core.encoding import UPPER_NUC_TO_BITS
    from lastz_tpu.core.scoring import new_dna_score_set
    from lastz_tpu.core.seeds import parse_seed
    from lastz_tpu.index.postable import build_seed_position_table
    from lastz_tpu.search.engine import (
        HitProcessorParams, SeedSearchEngine)

    # production-shaped pair: conserved 2-6 kbp segments at 72-85%
    # identity between random filler (the bench.py / scaling-ladder
    # shape).  A fully-aligned 60 kbp pair at a single diagonal is a
    # degenerate workload for the device path: ONE hash chain holds
    # ~45k hits and single extensions run ~60 kbp, so one XLA
    # execution outlives the tunnel's kill window ("TPU worker
    # crashed") — in production that falls back to host gracefully;
    # for evidence we measure the representative shape.
    rng = np.random.default_rng(3)
    alpha_b = np.frombuffer(b"ACGT", dtype=np.uint8)
    n = 60000
    s1 = alpha_b[rng.integers(0, 4, n)]
    parts = []
    for _ in range(9):
        L = int(rng.integers(2000, 6000))
        p = int(rng.integers(0, n - L))
        f = int(rng.integers(500, 2000))
        parts.append(alpha_b[rng.integers(0, 4, f)])
        seg = s1[p:p + L].copy()
        mut = rng.random(L) < (0.15 + 0.13 * rng.random())
        seg[mut] = alpha_b[rng.integers(0, 4, mut.sum())]
        parts.append(seg)
    s2 = np.concatenate(parts)

    def collect(env):
        with _EnvPatch(env):
            seed = parse_seed("1110100110010101111", with_trans=1)
            pt = build_seed_position_table(
                s1, 0, 0, UPPER_NUC_TO_BITS, seed, 1)
            sc = new_dna_score_set()
            hp = HitProcessorParams(
                gf_extend=GFEX_XDROP, scoring=sc, x_drop=910,
                hsp_threshold=ScoreThreshold("S", 3000))
            hits = []
            eng = SeedSearchEngine(
                s1, pt, s2, seed, UPPER_NUC_TO_BITS, hp,
                lambda p1, p2, ln, s:
                    hits.append((p1, p2, ln, s)) or ln)
            eng.search(0, len(s2))
            return hits

    ref = collect({"LASTZ_TPU_SCALAR_SEARCH": "1"})
    # STRICT: a device failure must fail this stage — a silent
    # fallback would "validate" the host replay against the scalar
    # oracle and record it as on-chip evidence
    dev = collect({"LASTZ_TPU_SCALAR_SEARCH": "0",
                   "LASTZ_TPU_HITGEN": "1",
                   "LASTZ_TPU_DEVICE_STRICT": "1"})
    if not ref:
        raise AssertionError("no hits from scalar oracle")
    if dev != ref:
        raise AssertionError(
            f"device hitgen mismatch: {len(dev)} vs {len(ref)} hits")
    return {
        "platform": jax.devices()[0].platform,
        "n_hits": len(ref),
        "hit_for_hit_identical": True,
    }


def stage_device_e2e():
    """Small-pair full pipeline with LASTZ_TPU_DEVICE=1: device hit
    generation + device gapped extension, LAV-equal to the host path.
    Records the wall clock honestly even if the tunnel makes it slow,
    plus which gapped kernel the device path used (Pallas exact is the
    default on TPU; VERDICT r4 item 2)."""
    import io as _io
    os.environ["LASTZ_TPU_BENCH_BP"] = os.environ.get(
        "LASTZ_TPU_EVIDENCE_BP", "1000000")
    import bench
    bench.TARGET_BP = int(os.environ["LASTZ_TPU_BENCH_BP"])
    bench.BENCH_T = "/tmp/lastz_tpu_evidence_t.fa"
    bench.BENCH_Q = "/tmp/lastz_tpu_evidence_q.fa"
    bench.ensure_pair()
    from lastz_tpu.cli import parse_options
    from lastz_tpu.pipeline import Pipeline
    from lastz_tpu import stats as _stats

    def run_once():
        _stats.reset()
        cfg = parse_options([bench.BENCH_T, bench.BENCH_Q])
        buf = _io.StringIO()
        t0 = time.time()
        Pipeline(cfg, buf).run()
        dt = time.time() - t0
        st = _stats.current
        return dt, buf.getvalue(), dict(
            hsps=int(st.hsps), alignments=int(st.alignments),
            gapped_device=int(st.gapped_device),
            gapped_host=int(st.gapped_host),
            timers={k: round(v, 2) for k, v in st.timers.items()})

    # STRICT: a transient device error must fail this stage rather
    # than silently recording a host-path run as "device e2e"
    with _EnvPatch({"LASTZ_TPU_DEVICE": "1",
                    "LASTZ_TPU_DEVICE_STRICT": "1"}):
        import jax
        gapped_kernel = ("pallas_exact"
                         if jax.default_backend() not in ("cpu", "gpu")
                         and os.environ.get("LASTZ_TPU_PALLAS", "auto")
                         not in ("0",)
                         else "xla_mega")
        cold_dt, dev_lav, _ = run_once()          # compiles included
        warm_dt, dev_lav, dev_detail = run_once()  # steady state
    with _EnvPatch({"LASTZ_TPU_DEVICE": "0"}):
        host_dt, host_lav, host_detail = run_once()
    if dev_detail.get("gapped_device", 0) <= 0:
        raise AssertionError(
            "device e2e ran but no gapped extension executed on "
            "device (gapped_device=0)")
    if dev_detail["hsps"] != host_detail["hsps"]:
        raise AssertionError(
            f"hsps stat differs between paths: device "
            f"{dev_detail['hsps']} vs host {host_detail['hsps']}")

    from lastz_tpu.tools.lav_compare import lav_equivalent
    same, why = lav_equivalent(dev_lav, host_lav)
    if not same:
        raise AssertionError(f"device LAV differs from host: {why[:300]}")
    import jax
    return {
        "platform": jax.devices()[0].platform,
        "pair_bp": bench.TARGET_BP,
        "gapped_kernel": gapped_kernel,
        "device_cold_seconds": round(cold_dt, 1),
        "device_warm_seconds": round(warm_dt, 1),
        "host_seconds": round(host_dt, 1),
        "lav_equal_device_vs_host": bool(same),
        "device_detail": dev_detail,
        "host_detail": host_detail,
    }


STAGE_FNS = {
    "probe": stage_probe,
    "pallas_validate": stage_pallas_validate,
    "pallas_rate": stage_pallas_rate,
    "xla_mega_rate": stage_xla_mega_rate,
    "hitgen_validate": stage_hitgen_validate,
    "device_e2e": stage_device_e2e,
}

_MARK = "EVIDENCE_RESULT_JSON:"


def run_stage_inproc(name: str) -> int:
    """Child-process entry: run one stage, print its JSON result."""
    os.environ.pop("JAX_PLATFORMS", None)
    try:
        result = STAGE_FNS[name]()
    except Exception:
        sys.stderr.write(traceback.format_exc(limit=20))
        return 1
    print(_MARK + json.dumps(result))
    return 0


def run_stage_subprocess(ev, name: str, retries: int = 2,
                         backoff: float = 60.0) -> bool:
    """Parent: run a stage in a fresh subprocess with retry."""
    attempts = []
    for attempt in range(retries + 1):
        t0 = time.time()
        sys.stderr.write(
            f"[evidence] stage {name} (attempt {attempt + 1}) ...\n")
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--stage", name],
                capture_output=True, text=True,
                timeout=STAGE_TIMEOUT[name], cwd=REPO)
            out = r.stdout or ""
            err = (r.stderr or "")[-2000:]
            dt = time.time() - t0
            result = None
            for line in out.splitlines():
                if line.startswith(_MARK):
                    result = json.loads(line[len(_MARK):])
            ok = r.returncode == 0 and result is not None
            attempts.append({"ts": _now(), "ok": ok,
                             "seconds": round(dt, 1),
                             "error": None if ok else err})
        except subprocess.TimeoutExpired:
            ok, result = False, None
            attempts.append({"ts": _now(), "ok": False,
                             "seconds": round(time.time() - t0, 1),
                             "error": f"stage timeout "
                                      f"({STAGE_TIMEOUT[name]}s)"})
        entry = {"ts": attempts[-1]["ts"], "ok": ok,
                 "seconds": attempts[-1]["seconds"],
                 "attempts": attempts}
        if ok:
            entry["result"] = result
        else:
            entry["error"] = attempts[-1]["error"]
        ev["stages"][name] = entry
        save_evidence(ev)
        sys.stderr.write(
            f"[evidence] stage {name}: ok={ok} "
            f"({attempts[-1]['seconds']}s)\n")
        if ok:
            return True
        if attempt < retries:
            sys.stderr.write(
                f"[evidence] retrying {name} in {backoff:.0f}s "
                f"(TPU worker faults are transient)\n")
            time.sleep(backoff)
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", help="run ONE stage in-process "
                                    "(child mode)")
    ap.add_argument("--retries", type=int, default=2)
    ap.add_argument("--only", help="comma-separated stage subset")
    args = ap.parse_args()
    if args.stage:
        return run_stage_inproc(args.stage)

    ev = load_evidence()
    ev["last_run_ts"] = _now()
    todo = STAGES if not args.only else [
        s for s in STAGES if s in args.only.split(",")]
    if not run_stage_subprocess(ev, "probe", retries=args.retries):
        sys.stderr.write("[evidence] probe failed; aborting\n")
        return 1
    for name in todo:
        if name == "probe":
            continue
        run_stage_subprocess(ev, name, retries=args.retries)
    ok = all(ev["stages"].get(s, {}).get("ok") for s in STAGES)
    ev["complete"] = bool(ok)
    if ok:
        hist = ev.setdefault("strict_passes", [])
        hist.append({"ts": _now(), "stages": {
            s: ev["stages"][s]["seconds"] for s in STAGES}})
        ev["strict_passes"] = hist[-10:]
    save_evidence(ev)
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())
