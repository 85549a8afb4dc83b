"""Companion tools (reference tools/ parity): maf_sort keys validated
against the reference tool's composite key tuples, fasta_fragments
against its shredding/uppercasing, lav_compare semantics, hsx builder
covered in test_hsx.py."""

import os
import subprocess
import sys

import pytest

from lastz_tpu.tools.maf_sort import sort_maf
from lastz_tpu.tools.fasta_fragments import fragments, read_fasta
from lastz_tpu.tools.lav_compare import lav_equivalent

HERE = os.path.dirname(os.path.abspath(__file__))
TD = "/root/reference/test_data"

MAF = """##maf version=1
a score=100
s cat  10 5 + 100 ACGTA
s pigB  3 5 + 50  ACCTA

a score=300
s cat   2 5 + 100 GGGTA
s pigA  8 5 + 50  GGCTA

a score=200
s cat   2 5 + 100 TTGTA
s pigB  1 5 + 50  TTCTA
"""


def scores_in_order(text):
    return [int(l.split("score=")[1]) for l in text.splitlines()
            if l.startswith("a score=")]


def test_maf_sort_keys():
    assert scores_in_order(sort_maf(MAF, "score")) == [100, 200, 300]
    assert scores_in_order(sort_maf(MAF, "score", reverse=True)) \
        == [300, 200, 100]
    assert scores_in_order(sort_maf(MAF, "pos1")) == [200, 300, 100]
    # name2 ties (pigB) break by score (reference key tuple)
    assert scores_in_order(sort_maf(MAF, "name2")) == [300, 100, 200]
    assert sort_maf(MAF, "pos1").startswith("##maf version=1")


def test_fasta_fragments():
    recs = [("chr", "ACGTACGTACGTACGTACGT")]
    out = list(fragments(recs, fragment=8, step=4))
    assert out[0] == ("chr_1", "ACGTACGT")
    assert out[1] == ("chr_5", "ACGTACGT")
    assert all(len(f) == 8 for _, f in out)
    # lowercase input is uppercased (reference tool behavior)
    out = list(fragments([("c", "acgtacgtac")], fragment=8, step=2))
    assert out[0][1] == "ACGTACGT"


def test_lav_compare_ignores_d_stanza():
    a = 'd {\n  "prog1 args"\n}\ns {\n  "x" 1 10 0 1\n}\n'
    b = 'd {\n  "prog2 other"\n}\ns {\n  "x" 1 10 0 1\n}\n'
    c = 'd {\n  "prog2 other"\n}\ns {\n  "y" 1 10 0 1\n}\n'
    assert lav_equivalent(a, b)[0]
    assert not lav_equivalent(a, c)[0]


def test_tools_run_as_modules():
    env = dict(os.environ, PYTHONPATH=os.path.dirname(HERE))
    r = subprocess.run(
        [sys.executable, "-m", "lastz_tpu.tools.maf_sort", "--key=pos1"],
        input=MAF, capture_output=True, text=True, env=env)
    assert r.returncode == 0
    assert scores_in_order(r.stdout) == [200, 300, 100]
