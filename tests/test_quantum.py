"""Quantum DNA alignment tests (reference quantum.c).

Fixtures: q1.qdna maps a pseudopig fragment to a 4-symbol alphabet
(0x01..0x04 with A~T/C~G-style complements in qscores.txt); q2.qdna
adds two ambiguity symbols (0x05~0x06) and a ball=70% score file.
Goldens were produced by the reference binary (v1.04.58).
"""

import io
import os

import pytest

from lastz_tpu.cli import parse_options
from lastz_tpu.pipeline import Pipeline

HERE = os.path.dirname(os.path.abspath(__file__))
Q = os.path.join(HERE, "golden", "quantum")
TD = "/root/reference/test_data"


def run(args):
    cfg = parse_options(args)
    buf = io.StringIO()
    Pipeline(cfg, buf).run()
    return buf.getvalue()


def normalize(text):
    text = text.replace("lastz.v1.04.58", "PROG")
    text = text.replace("lastz_tpu.v0.1.0", "PROG")
    text = text.replace(f"{Q}/", "").replace(f"{TD}/", "")
    text = text.replace("test_data/", "")
    # the d-stanza arg echo embeds paths; drop those lines
    return "\n".join(l for l in text.split("\n")
                     if not l.lstrip().startswith('"PROG'))


CASES = [
    ("quantum_golden.lav", "q1.qdna", "qscores.txt", []),
    ("quantum_hsp.lav", "q1.qdna", "qscores.txt", ["--nogapped"]),
    ("quantum2_gapped.lav", "q2.qdna", "qscores2.txt", []),
    ("quantum2_ball55.lav", "q2.qdna", "qscores2.txt",
     ["--ball=55%", "--nogapped"]),
]


@pytest.mark.parametrize("scalar", [False, True],
                         ids=["batched", "scalar"])
@pytest.mark.parametrize("golden,qdna,scores,extra", CASES,
                         ids=[c[0] for c in CASES])
def test_quantum_golden(golden, qdna, scores, extra, scalar,
                        monkeypatch):
    if scalar:
        monkeypatch.setenv("LASTZ_TPU_SCALAR_SEARCH", "1")
    got = run([f"{TD}/pseudocat.fa", f"{Q}/{qdna}[quantum]",
               f"Q={Q}/{scores}"] + extra)
    with open(os.path.join(Q, golden)) as f:
        want = f.read()
    assert normalize(got) == normalize(want)


def test_quantum_target_general():
    # quantum TARGET (rows quantum, cols DNA): position table built via
    # bottleneck/qToBest (pos_table.c:235)
    got = run([f"{Q}/q1.qdna", f"{TD}/pseudocat.fa",
               f"--scores={Q}/qtscores.txt", "--seed=match8",
               "--format=general:name1,name2,zstart1,end1,zstart2,end2,"
               "score,strand2"])
    with open(os.path.join(Q, "qtarget.general")) as f:
        want = f.read()
    assert normalize(got) == normalize(want)


def test_quantum_target_and_query():
    # both quantum: explicit bottleneck= line, quantum ball seeding
    got = run([f"{Q}/q1.qdna", f"{Q}/q2.qdna",
               f"--scores={Q}/qqscores.txt", "--seed=match8",
               "--ball=600", "--nogapped",
               "--format=general:zstart1,end1,zstart2,end2,score,strand2"])
    with open(os.path.join(Q, "qq.general")) as f:
        want = f.read()
    assert normalize(got) == normalize(want)


def test_quantum_target_tableonly():
    got = run([f"{Q}/q1.qdna", f"--scores={Q}/qtscores.txt",
               "--seed=match8", "--tableonly=count"])
    with open(os.path.join(Q, "qtarget_table.txt")) as f:
        want = f.read()
    got40 = "\n".join(normalize(got).split("\n")[:40])
    assert got40 == normalize(want).rstrip("\n")


def test_quantum_score_orientation_errors():
    with pytest.raises(SystemExit, match="row scores are for quantum"):
        run([f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa",
             f"--scores={Q}/qtscores.txt"])
    with pytest.raises(SystemExit, match="column scores are for quantum"):
        run([f"{Q}/q1.qdna", f"{TD}/pseudopig.fa",
             f"--scores={Q}/qscores.txt", "--seed=match8"])


def test_ball_requires_quantum():
    with pytest.raises(Exception):
        parse_options([f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa",
                       "--ball=500"])


def test_quantum_rejects_transitions():
    with pytest.raises(Exception):
        parse_options([f"{TD}/pseudocat.fa", f"{Q}/q1.qdna[quantum]",
                       f"Q={Q}/qscores.txt", "--transition"])


def test_quantum_rejects_maf():
    with pytest.raises(Exception):
        parse_options([f"{TD}/pseudocat.fa", f"{Q}/q1.qdna[quantum]",
                       f"Q={Q}/qscores.txt", "--format=maf"])
