"""The tweener's reused-buffer window search (align/tweener.py
window_search) must produce byte-identical output to the generic
per-window pipeline (reference tweener.c:239 bounded_align), across
inputs dense and sparse in inner hits."""

import io
import os

import numpy as np
import pytest

from lastz_tpu.cli import parse_options
from lastz_tpu.pipeline import Pipeline


def _run(args, env):
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        cfg = parse_options(args)
        buf = io.StringIO()
        Pipeline(cfg, buf).run()
        return buf.getvalue()
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def _write_pair(tmp_path, seed, n=60000, n_seg=10):
    rng = np.random.default_rng(seed)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    t = alpha[rng.integers(0, 4, n)]
    parts = []
    for _ in range(n_seg):
        L = int(rng.integers(1500, 4000))
        p = int(rng.integers(0, n - L))
        parts.append(alpha[rng.integers(0, 4, int(rng.integers(500, 2000)))])
        seg = t[p : p + L].copy()
        mut = rng.random(L) < 0.12
        seg[mut] = alpha[rng.integers(0, 4, int(mut.sum()))]
        parts.append(seg)
    q = np.concatenate(parts)

    def w(path, name, s):
        with open(path, "w") as f:
            f.write(">" + name + "\n")
            for i in range(0, len(s), 80):
                f.write(bytes(s[i : i + 80]).decode() + "\n")

    tp = str(tmp_path / "t.fa")
    qp = str(tmp_path / "q.fa")
    w(tp, "t", t)
    w(qp, "q", q)
    return tp, qp


@pytest.mark.parametrize("seed", [11, 23])
def test_fast_tweener_matches_generic(tmp_path, seed):
    tp, qp = _write_pair(tmp_path, seed)
    args = [tp, qp, "--inner=2200"]
    fast = _run(args, {"LASTZ_TPU_FAST_TWEENER": "1"})
    slow = _run(args, {"LASTZ_TPU_FAST_TWEENER": "0"})
    assert fast == slow
    assert "a {" in fast  # alignments actually produced


def test_fast_tweener_matches_generic_selfish(tmp_path):
    # near-identical pair: windows dense in inner hits exercise the
    # overflow-rerun path of the reused output buffers
    rng = np.random.default_rng(5)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    n = 30000
    t = alpha[rng.integers(0, 4, n)]
    q = t.copy()
    mut = rng.random(n) < 0.08
    q[mut] = alpha[rng.integers(0, 4, int(mut.sum()))]

    def w(path, name, s):
        with open(path, "w") as f:
            f.write(">" + name + "\n")
            for i in range(0, len(s), 80):
                f.write(bytes(s[i : i + 80]).decode() + "\n")

    tp = str(tmp_path / "t.fa")
    qp = str(tmp_path / "q.fa")
    w(tp, "t", t)
    w(qp, "q", q)
    args = [tp, qp, "--inner=2200"]
    fast = _run(args, {"LASTZ_TPU_FAST_TWEENER": "1"})
    slow = _run(args, {"LASTZ_TPU_FAST_TWEENER": "0"})
    assert fast == slow
