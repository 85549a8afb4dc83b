"""--outputmasking family (reference lastz.c:6585-6617, 1731-1759;
masking.c:447-660) and SAM ungapped-match records (sam.c:524)."""

import io
import os
import tempfile

import pytest

from lastz_tpu.cli import parse_options, UsageError
from lastz_tpu.pipeline import Pipeline

HERE = os.path.dirname(os.path.abspath(__file__))
G = os.path.join(HERE, "golden")
TD = "/root/reference/test_data"


def run(args):
    cfg = parse_options(args)
    buf = io.StringIO()
    Pipeline(cfg, buf).run()
    return buf.getvalue()


def golden(name):
    with open(os.path.join(G, name)) as f:
        return f.read()


MASK_CASES = [
    ("omask_dynamic.txt", ["--masking=2", "--outputmasking={}"]),
    ("omask_dynamic3.txt", ["--masking=2", "--outputmasking+={}"]),
    ("omask_soft.txt", ["--masking=2", "--outputmasking:soft={}"]),
]


@pytest.mark.parametrize("gold,args", MASK_CASES, ids=[c[0] for c in MASK_CASES])
def test_outputmasking_files(gold, args):
    with tempfile.NamedTemporaryFile("r", suffix=".mask") as tmp:
        run([f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa", "--nogapped"]
            + [a.format(tmp.name) for a in args])
        assert tmp.read() == golden(gold)


def test_outputmasking_soft3_partitioned_query_names():
    with tempfile.NamedTemporaryFile("r", suffix=".mask") as tmp:
        run([f"{TD}/pseudopig.fa[multiple]", f"{TD}/pseudocat.fa",
             "--nogapped", "--format=general", "--masking=1",
             f"--outputmasking+:soft={tmp.name}"])
        assert tmp.read() == golden("omask_soft3_multi.txt")


def test_outputmasking_requires_masking():
    with pytest.raises(UsageError):
        parse_options([f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa",
                       "--outputmasking=/tmp/x.mask"])


def test_outputmasking_rejected_for_partitioned_target():
    cfg = parse_options([f"{TD}/pseudopig.fa[multiple]",
                         f"{TD}/pseudocat.fa", "--format=general",
                         "--masking=2", "--outputmasking=/tmp/x.mask"])
    with pytest.raises(ValueError, match="multiple action"):
        Pipeline(cfg, io.StringIO()).run()


def test_lav_rejected_for_partitioned_target():
    cfg = parse_options([f"{TD}/pseudopig.fa[multiple]",
                         f"{TD}/pseudocat.fa"])
    with pytest.raises(ValueError, match="cannot be used with --lav"):
        Pipeline(cfg, io.StringIO()).run()


def test_sam_spellings():
    base = [f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa"]
    assert parse_options(base + ["--format=sam"]).output_format == "hardsam"
    cfg = parse_options(base + ["--format=SAM+EQX-"])
    assert cfg.output_format == "hardsam-"
    assert cfg.sam_mark_mismatches is True
    assert parse_options(base + ["--softsam-"]).output_format == "softsam-"
    with pytest.raises(UsageError):
        parse_options(base + ["--format=hardsam"])
