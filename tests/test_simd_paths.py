"""The SIMD host kernels (AVX-512/AVX2 y-drop row, 16-wide x-drop
scan, pshufb substitution strips) must be byte-identical to the
scalar recurrences on sequences that exercise their fast paths AND
their fallbacks (lowercase soft-masked runs, N's, separators)."""

import os
import subprocess
import sys

import numpy as np
import pytest


def _gen_pair(tmp_path, seed, n, with_junk):
    rng = np.random.default_rng(seed)
    alpha = np.frombuffer(b"ACGT", np.uint8)
    s1 = rng.choice(alpha, n).astype(np.uint8)
    out = []
    i = 0
    while i < n:
        r = rng.random()
        if r < 0.01:
            out.append(alpha[rng.integers(0, 4)])
            continue
        if r < 0.02:
            i += int(rng.integers(1, 4))
            continue
        if rng.random() < 0.12:
            out.append(alpha[rng.integers(0, 4)])
        else:
            out.append(s1[i])
        i += 1
    s2 = np.array(out, np.uint8)
    if with_junk:
        # lowercase runs and N's trip the uppercase-ACGT screens
        for s in (s1, s2):
            for _ in range(6):
                o = int(rng.integers(0, len(s) - 60))
                ln = int(rng.integers(5, 50))
                s[o:o + ln] |= 32  # lowercase
            for _ in range(4):
                o = int(rng.integers(0, len(s) - 10))
                s[o:o + int(rng.integers(1, 6))] = ord("N")
    t = tmp_path / f"t{seed}.fa"
    q = tmp_path / f"q{seed}.fa"
    t.write_text(">t\n" + bytes(s1).decode() + "\n")
    q.write_text(">q\n" + bytes(s2).decode() + "\n")
    return str(t), str(q)


def _run_cli(args, env_extra):
    env = dict(os.environ, PYTHONPATH=os.pathsep.join(
        [os.path.dirname(os.path.dirname(__file__))]
        + os.environ.get("PYTHONPATH", "").split(os.pathsep)),
        **env_extra)
    r = subprocess.run(
        [sys.executable, "-m", "lastz_tpu.cli"] + args,
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


@pytest.mark.parametrize("seed,with_junk", [(101, False), (202, True)])
def test_simd_row_and_xdrop_match_scalar(tmp_path, seed, with_junk):
    t, q = _gen_pair(tmp_path, seed, 25000, with_junk)
    args = [t, q, "--format=maf"]
    scalar = _run_cli(args, {"LASTZ_TPU_NO_AVX_ROW": "1"})
    simd512 = _run_cli(args, {})
    simd256 = _run_cli(args, {"LASTZ_TPU_NO_AVX512_ROW": "1"})
    strip = lambda s: "\n".join(l for l in s.splitlines()
                                if not l.startswith("#"))
    assert strip(simd512) == strip(scalar)
    assert strip(simd256) == strip(scalar)


def test_sweep_overflow_redo_matches(tmp_path):
    """When the int32 sweep reports score-headroom exhaustion, the
    extension is redone on the int64 per-row path with identical
    output.  LASTZ_TPU_SWEEP_OVERFLOW_BAR=1 forces every sweep onto
    the redo path (the real bar, INT32_MAX/2, needs a single
    extension scoring >1e9 — ~12 Mbp of perfect match)."""
    t, q = _gen_pair(tmp_path, 303, 25000, False)
    args = [t, q, "--format=maf"]
    normal = _run_cli(args, {})
    forced = _run_cli(args, {"LASTZ_TPU_SWEEP_OVERFLOW_BAR": "1"})
    strip = lambda s: "\n".join(l for l in s.splitlines()
                                if not l.startswith("#"))
    assert strip(forced) == strip(normal)
