"""Scoring-inference golden tests (reference infer_scores.c).

The reference repo checks in no inference goldens; the files under
tests/golden/ were produced by building the reference (v1.04.58,
lastz_D double-score build) and running:

  lastz_D test_data/pseudocat.fa test_data/pseudopig.fa --inferonly
  lastz_D ...  --inferonly=ctl.txt      (ctl.txt = golden/infer_ctl.txt)
  lastz_D ...  --infer --format=maf-

Our output must be byte-identical (including double-precision DP
tie-breaking in the post-inference alignment).
"""

import contextlib
import io
import os
import sys

import pytest

from lastz_tpu.cli import parse_options
from lastz_tpu.infer import drive_scoring_inference
from lastz_tpu.pipeline import Pipeline

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "golden")
TD = "/root/reference/test_data"


def golden_text(name):
    with open(os.path.join(GOLDEN, name)) as f:
        return f.read()


def run_infer(extra_args, control=None):
    cfg = parse_options(
        [f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa",
         "--scoretype=double"] + extra_args)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        inferred = drive_scoring_inference(
            cfg, cfg.infer_control_filename, cfg.infer_scores_filename)
    return buf.getvalue(), inferred, cfg


def test_inferonly_default():
    out, _, _ = run_infer(["--inferonly"])
    assert out == golden_text("infer_only.scores")


def test_inferonly_control_file():
    ctl = os.path.join(GOLDEN, "infer_ctl.txt")
    out, _, _ = run_infer([f"--inferonly={ctl}"])
    assert out == golden_text("infer_ctl.scores")


def test_infer_then_align():
    out, inferred, cfg = run_infer(["--infer", "--format=maf-"])
    cfg.scoring = inferred
    cfg.masked_scoring = None
    buf = io.StringIO()
    Pipeline(cfg, buf).run()
    assert out + buf.getvalue() == golden_text("infer_align.maf")


def test_infer_requires_double_scores():
    cfg = parse_options(
        [f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa", "--inferonly"])
    with pytest.raises(SystemExit):
        drive_scoring_inference(cfg, None, None)
