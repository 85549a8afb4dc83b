"""Golden-output tests against the reference's checked-in outputs.

Each case mirrors a make target from the reference src/Makefile
(src/Makefile:298-590); inputs are read from the reference test_data
directory and outputs compared semantically (d-stanza ignored, exactly
like tools/lav_compare.py).
"""

import contextlib
import io
import os
import tempfile

import pytest

from lastz_tpu.cli import parse_options
from lastz_tpu.pipeline import Pipeline

from lav_diff import lav_equal

TD = "../test_data"  # relative, exactly as the reference Makefile invokes

_WORKDIR = None


def _workdir():
    """A cwd from which ../test_data resolves to the reference fixtures,
    so that filename strings embedded in outputs match the goldens."""
    global _WORKDIR
    if _WORKDIR is None:
        root = tempfile.mkdtemp(prefix="lastz_tpu_golden_")
        os.symlink("/root/reference/test_data", os.path.join(root, "test_data"))
        run = os.path.join(root, "run")
        os.mkdir(run)
        _WORKDIR = run
    return _WORKDIR


def run_lastz(args):
    cfg = parse_options(args)
    buf = io.StringIO()
    prev = os.getcwd()
    os.chdir(_workdir())
    try:
        Pipeline(cfg, buf).run()
    finally:
        os.chdir(prev)
    return buf.getvalue()


def check_lav(golden_name, args):
    got = run_lastz(args)
    ok, msg = lav_equal(
        os.path.join("/root/reference/test_data", golden_name), got)
    assert ok, msg


def test_hits():
    check_lav("base_test.hits.lav", [
        f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa",
        "W=8", "T=0", "--plus", "--nogfextend", "--nogapped"])


def test_hsp():
    check_lav("base_test.hsp.lav", [
        f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa", "C=3", "W=8", "T=0"])


def test_default():
    check_lav("base_test.default.lav", [
        f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa"])


def test_extended():
    check_lav("base_test.extended.lav", [
        f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa", "C=2", "W=8", "T=0"])


def test_chained():
    check_lav("base_test.chained.lav", [
        f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa", "C=1", "W=8", "T=0"])


def test_seeded():
    check_lav("base_test.seeded.lav", [
        f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa", "C=3",
        "--seed=111010011101"])


def test_hw_seeded():
    check_lav("base_test.hwseeded.lav", [
        f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa", "C=3",
        "--seed=TTT0T0T0TTT00T0T"])
