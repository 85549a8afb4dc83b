"""Count-based alignment filters (reference --filter=nmatch/nmismatch/
ngap/cgap; identity_dist.c:492,639, continuity_dist.c:116,216).

Includes the reference's setup-time quirk: a ratio nmatch filter
(--filter=nmatch:<pct>%) leaves minMatchCount==0 when the hit reporter
is chosen, so in ungapped immediate-report mode it never filters."""

import io
import os

import pytest

from lastz_tpu.cli import parse_options
from lastz_tpu.pipeline import Pipeline

HERE = os.path.dirname(os.path.abspath(__file__))
G = os.path.join(HERE, "golden", "filters")
TD = "/root/reference/test_data"

CASES = [
    ("_filterenmatchc400.lav", ["--filter=nmatch:400"]),
    ("_filterenmismatchc0pp100.lav", ["--filter=nmismatch:0..100"]),
    ("_filterengapc0pp5.lav", ["--filter=ngap:0..5"]),
    ("_filterecgapc0pp20.lav", ["--filter=cgap:0..20"]),
    ("_filterenmatchc3ps_nogapped.lav",
     ["--filter=nmatch:3%", "--nogapped"]),
    ("_filterenmatchc400s_nogapped.lav",
     ["--filter=nmatch:400", "--nogapped"]),
]


def run(args):
    cfg = parse_options(args)
    buf = io.StringIO()
    Pipeline(cfg, buf).run()
    return buf.getvalue()


def strip_echo(text):
    text = text.replace(f"{TD}/", "").replace("test_data/", "")
    return "\n".join(l for l in text.split("\n")
                     if not l.lstrip().startswith('"lastz'))


@pytest.mark.parametrize("golden,args", CASES, ids=[c[0] for c in CASES])
def test_filter_golden(golden, args):
    got = run([f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa"] + args)
    with open(os.path.join(G, golden)) as f:
        want = f.read()
    assert strip_echo(got) == strip_echo(want)
