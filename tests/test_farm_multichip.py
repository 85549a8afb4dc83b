"""Full-aligner multi-device execution: the query farm-out router
(pipeline.py; reference capsule.c:6-15 farm-out) must produce output
byte-identical to the single-device run, for the REAL pipeline
(search + gapped + writers), on an 8-virtual-device CPU mesh."""

import io
import os

import numpy as np
import pytest


def _make_inputs(tmp_path, n=3000, nq=6, seed=21):
    rng = np.random.default_rng(seed)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    t = alpha[rng.integers(0, 4, n)]
    tf = tmp_path / "t.fa"
    tf.write_text(">t\n" + bytes(t).decode() + "\n")
    lines = []
    for i in range(nq):
        p = int(rng.integers(0, n - 900))
        q = t[p:p + 800].copy()
        mut = rng.random(len(q)) < 0.12
        q[mut] = alpha[rng.integers(0, 4, mut.sum())]
        lines.append(f">q{i}\n" + bytes(q).decode())
    qf = tmp_path / "q.fa"
    qf.write_text("\n".join(lines) + "\n")
    return str(tf), str(qf)


def _run(args, env):
    from lastz_tpu.cli import parse_options
    from lastz_tpu.pipeline import Pipeline
    saved = {}
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        cfg = parse_options(args)
        buf = io.StringIO()
        pl = Pipeline(cfg, buf)
        pl.run()
        return buf.getvalue(), pl
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


@pytest.mark.parametrize("fmt", ["lav", "maf"])
def test_farm_output_equality(tmp_path, fmt):
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device backend")
    t, q = _make_inputs(tmp_path)
    args = [t, q, f"--format={fmt}", "--ydrop=3000"]

    base_env = {"LASTZ_TPU_DEVICE": "1", "LASTZ_TPU_FARM": "0",
                "LASTZ_TPU_HIT_BUDGET": str(1 << 14),
                "LASTZ_TPU_YDROP_WIDTH": "192",
                "LASTZ_TPU_YDROP_ROWS": "128",
                "LASTZ_TPU_YDROP_BATCH": "8"}
    import lastz_tpu.align.ydrop_device as ydd
    saved = (ydd.DEFAULT_WIDTH, ydd.DEFAULT_ROWS, ydd.DEFAULT_BATCH)
    ydd.DEFAULT_WIDTH, ydd.DEFAULT_ROWS, ydd.DEFAULT_BATCH = 192, 128, 8
    try:
        one_out, _ = _run(args, base_env)
        farm_env = dict(base_env, LASTZ_TPU_FARM="1")
        farm_out, pl = _run(args, farm_env)
    finally:
        (ydd.DEFAULT_WIDTH, ydd.DEFAULT_ROWS,
         ydd.DEFAULT_BATCH) = saved

    assert len(pl._farm_devices()) >= 2, "farm-out was not active"
    assert farm_out == one_out

    # and both equal the pure-host run
    host_out, _ = _run(args, {"LASTZ_TPU_DEVICE": "0",
                              "LASTZ_TPU_FARM": "0"})
    assert farm_out == host_out
