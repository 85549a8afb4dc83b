"""Short-read mapping recipes (reference README 'Any-or-None
Alignment' section and the --yasra* expanders).

reads101.fastq: 80 synthetic 101bp reads sampled from pseudocat (2%
mutation, 1/3 reverse-complemented, every 10th random junk); goldens
produced by the reference binary (v1.04.58).
"""

import io
import os

import pytest

from lastz_tpu.cli import parse_options
from lastz_tpu.pipeline import Pipeline

HERE = os.path.dirname(os.path.abspath(__file__))
G = os.path.join(HERE, "golden")
TD = "/root/reference/test_data"

ANYORNONE = ["--anyornone", "--step=10", "--seed=match12",
             "--notransition", "--exact=20", "--noytrim", "--match=1,5",
             "--ambiguous=n"]


def run(args):
    cfg = parse_options(args)
    buf = io.StringIO()
    Pipeline(cfg, buf).run()
    return buf.getvalue()


def norm(text):
    text = text.replace(f"{G}/", "").replace(f"{TD}/", "")
    text = text.replace("test_data/", "")
    return "\n".join(l for l in text.split("\n")
                     if not l.lstrip().startswith('"lastz')
                     and not l.startswith("@PG"))


CASES = [
    ("anyornone_map.general",
     ANYORNONE + ["--filter=coverage:90", "--filter=identity:95",
                  "--format=general:name2,name1,zstart1,end1,strand2,"
                  "score"]),
    ("anyornone_map.sam", ANYORNONE + ["--format=softsam"]),
    ("yasra90.lav", ["--yasra90"]),
]


@pytest.mark.parametrize("golden,args", CASES, ids=[c[0] for c in CASES])
def test_read_mapping(golden, args):
    got = run([f"{TD}/pseudocat.fa", f"{G}/reads101.fastq"] + args)
    with open(os.path.join(G, golden)) as f:
        want = f.read()
    assert norm(got) == norm(want)


def test_match_scoring_defaults():
    """--match=1,5 derives thresholds per lastz.c:9169-9236."""
    cfg = parse_options([f"{TD}/pseudocat.fa", f"{G}/reads101.fastq",
                         "--match=1,5"])
    assert cfg.hsp_threshold.s == 30      # ceil(30 * match)
    assert cfg.x_drop == 23               # ceil(10 * sqrt(5))
    assert cfg.y_drop == 46               # 2 * xDrop
    assert cfg.scoring.gap_open == 17     # ceil(3.25 * 5)
    assert cfg.scoring.gap_extend == 2    # ceil(0.24375 * 5)
    assert cfg.scoring.sub[ord("A"), ord("A")] == 1
    assert cfg.scoring.sub[ord("A"), ord("C")] == -5
