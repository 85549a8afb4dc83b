"""Capsule (persisted index snapshot) round-trip tests
(reference capsule.c; write at lastz.c:1361, read at lastz.c:8807)."""

import io
import os
import tempfile

import numpy as np

from lastz_tpu.cli import parse_options
from lastz_tpu.pipeline import Pipeline
from lastz_tpu.index.capsule import (
    write_capsule_file, open_capsule_file, unitize)

TD = "/root/reference/test_data"


def run(args):
    cfg = parse_options(args)
    buf = io.StringIO()
    Pipeline(cfg, buf).run()
    return buf.getvalue()


def strip_d_stanza(lav: str) -> str:
    """Drop the d-stanza (command-line echo), as tools/lav_compare.py
    does: it legitimately differs between capsule and direct runs."""
    out, skipping = [], False
    for line in lav.splitlines(keepends=True):
        if line.startswith("d {"):
            skipping = True
        if not skipping:
            out.append(line)
        if skipping and line.startswith("}"):
            skipping = False
    return "".join(out)


def test_capsule_round_trip_matches_direct_run():
    with tempfile.TemporaryDirectory() as tmp:
        cap = os.path.join(tmp, "cat.cap")
        out = run([f"{TD}/pseudocat.fa", f"--writecapsule={cap}"])
        assert "byte target sequence capsule written to" in out
        assert os.path.exists(cap)

        via_capsule = run([f"--targetcapsule={cap}", f"{TD}/pseudopig.fa"])
        direct = run([f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa"])
        assert strip_d_stanza(via_capsule) == strip_d_stanza(direct)


def test_capsule_preserves_seed_and_step():
    with tempfile.TemporaryDirectory() as tmp:
        cap = os.path.join(tmp, "cat.cap")
        run([f"{TD}/pseudocat.fa", f"--writecapsule={cap}",
             "--seed=match12", "--step=3", "--nogapped", "--notransition"])
        via_capsule = run([f"--targetcapsule={cap}", f"{TD}/pseudopig.fa",
                           "--nogapped", "--notransition"])
        direct = run([f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa",
                      "--seed=match12", "--step=3", "--nogapped",
                      "--notransition"])
        assert strip_d_stanza(via_capsule) == strip_d_stanza(direct)


def test_capsule_arrays_memory_mapped():
    with tempfile.TemporaryDirectory() as tmp:
        cap = os.path.join(tmp, "t.cap")
        run([f"{TD}/pseudocat.fa", f"--writecapsule={cap}"])
        target, pt = open_capsule_file(cap)
        assert isinstance(pt.csr_pos, np.memmap)
        assert isinstance(target.v, np.memmap)
        # writable copy requested => plain private array
        target2, _ = open_capsule_file(cap, writable_target=True)
        assert not isinstance(target2.v, np.memmap)
        target2.v[0] = ord("x")  # must not raise


def test_unitize():
    assert unitize(999) == "1.0K"  # C's rep>99 rescale (utilities.c:1238)
    assert unitize(99) == "99.0"
    assert unitize(134269276) == "0.1G"
    assert unitize(67000000) == "67.0M"
