"""Golden tests for the long tail of output formats
(reference output.h:34-76 format enum).

Goldens under golden/formats/ were produced by the reference binary
(v1.04.58) on pseudocat.fa vs pseudopig.fa; comparison is byte-exact
after normalizing the program-name string.
"""

import io
import os

import pytest

from lastz_tpu.cli import parse_options
from lastz_tpu.pipeline import Pipeline

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "golden", "formats")
TD = "/root/reference/test_data"


def run(args):
    cfg = parse_options(
        [f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa"] + args)
    # the reference goldens embed the reference's relative paths/args;
    # normalize both sides below instead
    buf = io.StringIO()
    Pipeline(cfg, buf).run()
    return buf.getvalue()


def normalize(text: str) -> str:
    text = text.replace("lastz.v1.04.58", "PROG")
    text = text.replace("lastz_tpu.v0.1.0", "PROG")
    text = text.replace(f"{TD}/", "").replace("test_data/", "")
    # drop the command-echo lines (d-stanza first line / # PROG line):
    # args strings legitimately differ between the two binaries
    return "\n".join(l for l in text.split("\n")
                     if not l.lstrip().startswith('"PROG')
                     and not l.startswith("# PROG")
                     and not l.startswith("d PROG"))


CASES = [
    ("fmt_identity.out", ["--format=identity"]),
    ("fmt_lavp.out", ["--format=lav+"]),
    ("fmt_lavscore.out", ["--format=lavscore"]),
    ("fmt_lavptext.out", ["--format=lav+text"]),
    ("fmt_gfanoscore.out", ["--format=gfanoscore"]),
    ("fmt_axtcsize2.out", ["--format=axt:size2"]),
    ("fmt_istats.out", ["--format=istats"]),
    ("fmt_istatsb85q.out", ["--format=istats(85)"]),
    ("fmt_mafp.out", ["--format=maf+"]),
    ("fmt_axtp.out", ["--format=axt+"]),
    ("r2_sformatecompsnogapped.out", ["--format=comp", "--nogapped"]),
    ("r2_sformatecompsnogappedstepe7.out",
     ["--format=comp", "--nogapped", "--step=7"]),
    ("r2_sformatedeseedsnogapped.out", ["--format=deseed", "--nogapped"]),
    ("r2_sformateidentitysnogapped.out",
     ["--format=identity", "--nogapped"]),
    ("r2_sformateistatsnogapped.out", ["--format=istats", "--nogapped"]),
    ("r2_sformatelavptextsnogapped.out",
     ["--format=lav+text", "--nogapped"]),
    ("r2_sformateaxtpsnogapped.out", ["--format=axt+", "--nogapped"]),
    ("blastn_noheader.txt", ["--format=blastn-"]),
    ("paf.txt", ["--format=paf"]),
    ("entropy_fields.txt",
     ["--format=general:entropy1,entropy2,gaprate,score"]),
    ("entropy_fields_ungapped.txt",
     ["--format=general:entropy1,entropy2,gaprate", "--nogapped"]),
    ("sam_eqx_ungapped.txt", ["--format=sam+eqx", "--nogapped"]),
]


@pytest.mark.parametrize("golden,args", CASES,
                         ids=[" ".join(c[1]) for c in CASES])
def test_format_golden(golden, args):
    with open(os.path.join(GOLDEN, golden)) as f:
        want = f.read()
    got = run(args)
    assert normalize(got) == normalize(want)
