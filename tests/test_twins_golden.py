"""--twins / --recoverseeds pipeline goldens.

Goldens produced by the reference binary (v1.04.58) on
pseudocat/pseudopig:
    lastz pseudocat.fa pseudopig.fa --twins=0..20
    lastz pseudocat.fa pseudopig.fa --recoverseeds
    lastz pseudocat.fa pseudopig.fa --twins=2..40 --nogapped
Both the batched path (default) and the scalar engine
(LASTZ_TPU_SCALAR_SEARCH=1) must match them
(process_for_twin_hit seed_search.c:1526,
process_for_recoverable_hit :1221)."""

import io
import os

import pytest

from lastz_tpu.cli import parse_options
from lastz_tpu.pipeline import Pipeline

from lav_diff import lav_equal

HERE = os.path.dirname(os.path.abspath(__file__))
G = os.path.join(HERE, "golden")
TD = "/root/reference/test_data"

CASES = [
    ("twins0_20.lav", ["--twins=0..20"]),
    ("recoverseeds.lav", ["--recoverseeds"]),
    ("twins2_40_ungapped.lav", ["--twins=2..40", "--nogapped"]),
]


@pytest.mark.parametrize("scalar", [False, True],
                         ids=["batched", "scalar"])
@pytest.mark.parametrize("golden,args", CASES,
                         ids=[c[0] for c in CASES])
def test_twins_golden(golden, args, scalar, monkeypatch):
    if scalar:
        monkeypatch.setenv("LASTZ_TPU_SCALAR_SEARCH", "1")
    cfg = parse_options(
        [f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa"] + args)
    buf = io.StringIO()
    Pipeline(cfg, buf).run()
    # goldens were produced with the reference's cwd next to
    # test_data/, so they embed relative paths
    got = buf.getvalue().replace(f"{TD}/", "test_data/")
    ok, msg = lav_equal(os.path.join(G, golden), got)
    assert ok, msg
