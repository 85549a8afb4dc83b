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


def run_and_diff(golden_name, args, pipe=None):
    got = run_lastz(args)
    if pipe == "maf_sort_pos1":
        got = _maf_sort_pos1(got)
    with open(os.path.join("/root/reference/test_data", golden_name)) as f:
        golden = f.read()
    assert golden == got, f"{golden_name}: byte mismatch"


def _maf_sort_pos1(text):
    # faithful equivalent of tools/maf_sort.py --key=pos1
    lines = text.splitlines()
    blocks = []
    comments = []
    i = 0
    while i < len(lines):
        line = lines[i]
        if line.startswith("a "):
            block = [line]
            i += 1
            while i < len(lines) and lines[i].strip():
                block.append(lines[i])
                i += 1
            s1 = block[1].split()
            s2 = block[2].split()
            score = float(block[0].split("score=")[1])
            key = (int(s1[2]), s1[4], int(s2[2]), s2[4],
                   int(s1[3]), int(s2[3]), score, s1[1], s2[1])
            blocks.append((key, block, comments))
            comments = []
        elif line.startswith("#") or not line.strip():
            if line.strip():
                comments.append(line)
            i += 1
        else:
            comments.append(line)
            i += 1
    blocks.sort()
    out = []
    for key, block, comm in blocks:
        if comm:
            out.append("\n".join(comm))
        out.append("\n".join(block))
        out.append("")
    return "\n".join(out) + "\n" if blocks else text


def test_adaptive_k():
    got = run_lastz([
        f"{TD}/aglobin.2bit/human", f"{TD}/aglobin.2bit/cow",
        "C=3", "W=8", "T=0", "--noentropy", "K=top50%", "--gfa"])
    a_lines = sorted(
        (l for l in got.splitlines() if l.startswith("a ")),
        key=lambda l: -int(l.split()[2]))
    with open("/root/reference/test_data/base_test.adaptive_k.gfa") as f:
        golden = sorted(
            (l.rstrip("\n") for l in f if l.startswith("a ")),
            key=lambda l: -int(l.split()[2]))
    assert sorted(golden) == sorted(a_lines)


def test_ow_seeded():
    got = run_lastz([
        f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa",
        "--justhits", "--seed=111010011101", "--word=12", "--gfa"])
    mine = sorted(l for l in got.splitlines() if l[0] in "azsh")
    with open("/root/reference/test_data/base_test.owseeded.gfa") as f:
        golden = sorted(l.rstrip("\n") for l in f if l[0] in "azsh")
    # d-record (command line) differs; a/z/s/h records must match
    assert golden == mine


def test_axt():
    got = run_lastz([
        f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa", "--format=axt"])
    strip = lambda t: [l for l in t.splitlines() if not l.startswith("#")]
    with open("/root/reference/test_data/base_test.default.axt") as f:
        golden = strip(f.read())
    assert golden == strip(got)


def test_anchors():
    run_and_diff("base_test.anchors.maf", [
        f"{TD}/aglobin.2bit/human", f"{TD}/aglobin.2bit/cow",
        "C=0", "--format=maf-",
        f"--anchors={TD}/base_test.anchors.anchors"])


def test_anchors_multi():
    run_and_diff("base_test.anchors_multi.maf", [
        f"{TD}/aglobin.2bit/human",
        f"{TD}/shorties.fa[subset={TD}/shorties.names]",
        "C=0", "--format=maf-",
        f"--anchors={TD}/base_test.anchors_multi.anchors"])


def test_subrange():
    check_lav("base_test.subrange.lav", [
        f"{TD}/aglobin.2bit/human[10000,60000]",
        f"{TD}/aglobin.2bit/cow[15000#40000]"])


def test_mask():
    check_lav("base_test.mask.lav", [
        f"{TD}/pseudocat.fa",
        f"{TD}/pseudopig.fa[nmask={TD}/pseudopig.n.mask]",
        "--ambiguous=n,60"])


def test_coi_fa():
    run_and_diff("base_test.coi.maf", [
        f"{TD}/aglobin.2bit/human",
        f"{TD}/shorties.fa[subset={TD}/shorties.names]",
        "K=3000", "--maf-"])


def test_coi_2bit():
    run_and_diff("base_test.coi.maf", [
        f"{TD}/aglobin.2bit/human",
        f"{TD}/shorties.2bit[subset={TD}/shorties.names]",
        "K=3000", "--maf-"])


def test_multi():
    run_and_diff("base_test.multi.maf", [
        f"{TD}/aglobin.2bit/human",
        f"{TD}/shorties.2bit[multi,@{TD}/shorties.names]",
        "K=3000", "--maf-"], pipe="maf_sort_pos1")


def test_multi_subrange():
    run_and_diff("base_test.multi_subrange.maf", [
        f"{TD}/aglobin.2bit/human",
        f"{TD}/shorties.2bit[multi,51..200]",
        "K=3000", "--maf-"])


def test_masking():
    check_lav("base_test.masking.lav", [
        f"{TD}/fake_apple.fa", f"{TD}/fake_orange_reads.fa", "--masking=3"])


def test_segments_roundtrip(tmp_path):
    hsps = run_lastz([
        f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa",
        "--nogapped", "--format=segments"])
    p = tmp_path / "segments.hsps"
    p.write_text(hsps)
    check_lav("base_test.default.lav", [
        f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa", f"--segments={p}"])


def test_interpolated():
    check_lav("base_test.interpolated.lav", [
        f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa",
        "C=2", "W=8", "T=0", "H=2200"])


def test_float():
    check_lav("base_test.float.lav", [
        f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa",
        "C=2", "W=8", "T=0", "--doublescore"])


def test_nib_target():
    got = run_lastz([
        f"{TD}/pseudopig2.nib", f"{TD}/pseudocat.fa", "C=2", "W=8", "T=0"])
    import re
    got = re.sub(r"\.\..*\.nib:.*\"", "> pig2\"", got)
    got = got.replace(".nib", ".fa")
    import io as _io
    from lav_diff import _strip_d_stanzas
    with open("/root/reference/test_data/base_test.pig_cat.lav") as f:
        golden = _strip_d_stanzas(f.read())
    assert golden == _strip_d_stanzas(got)


def test_2bit_target_contig():
    got = run_lastz([
        f"{TD}/pseudopig.2bit/pig2", f"{TD}/pseudocat.fa",
        "C=2", "W=8", "T=0"])
    got = got.replace("pig", "> pig").replace("do> pig.2bit", "dopig2.fa")
    import re
    got = re.sub(r"(dopig2.*) 0 2", r"\1 0 1", got)
    from lav_diff import _strip_d_stanzas
    with open("/root/reference/test_data/base_test.pig_cat.lav") as f:
        golden = _strip_d_stanzas(f.read())
    assert golden == _strip_d_stanzas(got)


def test_2bit_query():
    got = run_lastz([
        f"{TD}/pseudocat.fa", f"{TD}/pseudopig.2bit", "C=2", "W=8", "T=0"])
    got = got.replace("pig", "> pig").replace("do> pig.2bit", "dopig.fa")
    from lav_diff import _strip_d_stanzas
    with open("/root/reference/test_data/base_test.extended.lav") as f:
        golden = _strip_d_stanzas(f.read())
    assert golden == _strip_d_stanzas(got)


def _maf_body(text):
    return [ln for ln in text.splitlines() if not ln.startswith("#")]


def test_self_multiple_nomirror():
    """[multiple] + --self: partitioned trivial self-alignments must
    be inserted (blocking diagonal merges) yet suppressed by
    --nomirror (reference gapped_extend.c:1123-1280)."""
    got = run_lastz([f"{TD}/aglobin.2bit[multiple]", "--self",
                     "--nomirror", "--format=maf"])
    golden = open(os.path.join(os.path.dirname(__file__), "golden",
                               "self_multiple_nomirror.maf")).read()
    assert _maf_body(got) == _maf_body(golden)


def test_self_multiple_mirror():
    """[multiple] + --self with mirroring: the per-partition trivial
    alignments are emitted."""
    got = run_lastz([f"{TD}/aglobin.2bit[multiple]", "--self",
                     "--format=maf"])
    golden = open(os.path.join(os.path.dirname(__file__), "golden",
                               "self_multiple_mirror.maf")).read()
    assert _maf_body(got) == _maf_body(golden)
