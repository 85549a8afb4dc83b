"""Multi-chip sharded pipeline: the SAME inputs processed on a
1-device and an 8-device mesh must produce identical outputs (VERDICT
round-1 item 4).  Runs on the virtual CPU mesh (conftest provisions 8
host devices); the step uses the production kernels — real spaced-seed
packing, CSR counts over a real position table, x-drop diagonal scans
and the exact y-drop chunk — with the census combined by psum.

Also covers the process-level sharding story: CLI query subsetting
(--shard=i/n) concatenates into the unsharded output.
"""

import io
import os

import numpy as np
import pytest


_CACHED = {}


def _real_inputs():
    """Inputs built ONCE for the finest sharding (8): anchors then
    respect 8-way query-block ownership, which nests inside any
    coarser mesh, so the exact same arrays feed every mesh size."""
    if "inp" in _CACHED:
        return _CACHED["inp"]
    from lastz_tpu.core.scoring import new_dna_score_set
    from lastz_tpu.core.seeds import parse_seed
    from lastz_tpu.parallel.mesh import build_mesh_inputs

    rng = np.random.default_rng(3)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    target = alpha[rng.integers(0, 4, 20000)]
    queries = []
    for i in range(16):
        p = int(rng.integers(0, len(target) - 600))
        q = target[p:p + 512].copy()
        mut = rng.random(len(q)) < 0.08
        q[mut] = alpha[rng.integers(0, 4, mut.sum())]
        queries.append(q)
    seed = parse_seed("1110100110010101111", with_trans=0)
    scoring = new_dna_score_set()
    inp = build_mesh_inputs(
        target, queries, seed, scoring, n_shards=8,
        q_per_shard=2, qlen=512, anchors_per_shard=1)
    _CACHED["inp"] = (seed, scoring, inp)
    return _CACHED["inp"]


def _run_mesh(n_dev):
    import jax
    import jax.numpy as jnp
    from lastz_tpu.parallel.mesh import make_dp_mesh, \
        make_sharded_pipeline

    devices = jax.devices("cpu")[:n_dev]
    assert len(devices) == n_dev
    seed, scoring, inp = _real_inputs()
    mesh = make_dp_mesh(devices)
    step = make_sharded_pipeline(
        mesh, seed, gap_e=inp["gap_e"], gap_oe=inp["gap_oe"])
    out = step(jnp.asarray(inp["q_codes"]), jnp.asarray(inp["t_codes"]),
               jnp.asarray(inp["csr_start"]), jnp.asarray(inp["sub4"]),
               jnp.asarray(inp["subsmall"]),
               jnp.asarray(inp["anchors12"]),
               {k: jnp.asarray(v) for k, v in inp["state"].items()},
               jnp.asarray(inp["a_small"]), jnp.asarray(inp["b_small"]))
    return [np.asarray(o) for o in out]


def test_mesh_1_vs_8_devices_identical():
    out1 = _run_mesh(1)
    out8 = _run_mesh(8)
    names = ["counts", "hsp_score", "ydrop_score", "end1", "end2",
             "census", "total_hits"]
    for name, a, b in zip(names, out1, out8):
        assert np.array_equal(a, b), f"{name} differs between meshes"
    # sanity: real work happened
    assert int(out1[6]) > 0          # seed hits counted
    assert (out1[2] > 0).any()       # y-drop extensions scored


def test_cli_shard_concatenation(tmp_path):
    """--shard=i/n outputs concatenate into the full run's output
    (the reference's capsule farm-out contract)."""
    from lastz_tpu.cli import parse_options
    from lastz_tpu.pipeline import Pipeline

    rng = np.random.default_rng(5)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    target = alpha[rng.integers(0, 4, 8000)]
    tpath = tmp_path / "t.fa"
    tpath.write_text(">t\n" + bytes(target).decode() + "\n")
    qpath = tmp_path / "q.fa"
    with open(qpath, "w") as f:
        for i in range(6):
            p = int(rng.integers(0, len(target) - 900))
            q = target[p:p + 800].copy()
            mut = rng.random(len(q)) < 0.1
            q[mut] = alpha[rng.integers(0, 4, mut.sum())]
            f.write(f">q{i}\n" + bytes(q).decode() + "\n")

    fmt = "--format=general-:name2,start1,end1,start2,end2,score"

    def run(args):
        cfg = parse_options(args)
        buf = io.StringIO()
        Pipeline(cfg, buf).run()
        return buf.getvalue()

    full = run([str(tpath), str(qpath), fmt])
    parts = [run([str(tpath), str(qpath), fmt, f"--shard={i}/3"])
             for i in range(3)]
    # every full-run line appears in exactly one shard, and each
    # shard's lines appear in the full run in the same relative order
    full_lines = [l for l in full.splitlines() if l.strip()]
    part_lines = [[l for l in p.splitlines() if l.strip()]
                  for p in parts]
    assert sorted(full_lines) == sorted(sum(part_lines, []))
    for pl in part_lines:
        it = iter(full_lines)
        assert all(l in it for l in pl), "shard order broken"
