"""Tool-layer parity: any_to_qdna, masking-interval tools, lav_sort,
axt/gfa comparators, score-file generators, tabular_to_maf
(reference tools/*.py and tabular_tools/*.py)."""

import io
import os
import struct
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
TD = "/root/reference/test_data"


def run_tool(mod, args, stdin=b"", text=False):
    p = subprocess.run(
        [sys.executable, "-m", f"lastz_tpu.tools.{mod}"] + args,
        input=stdin if not text else stdin,
        capture_output=True, text=text, cwd=os.path.dirname(HERE))
    return p


def test_any_to_qdna_roundtrip(tmp_path):
    data = bytes([1, 2, 3, 4] * 50)
    p = run_tool("any_to_qdna", ["--name=frag"], stdin=data)
    out = p.stdout
    magic, version, hlen, soff, noff, slen = struct.unpack(">6I", out[:24])
    assert magic == 0xC4B47197 and slen == len(data)
    assert out[noff:noff + 5] == b"frag\0"
    assert out[soff:] == data
    # and our qdna reader accepts it
    qf = tmp_path / "frag.qdna"
    qf.write_bytes(out)
    from lastz_tpu.io.sequence import SequenceFile
    seq = SequenceFile(str(qf)).load()
    # the reference IGNORES the embedded qdna name (sequences.c:4744
    # reads and discards nameOffset): display name is the file name
    assert bytes(seq.v) == data and seq.name_for_output() == "frag.qdna"


def test_merge_masking_intervals():
    src = b"555941 556479\n556153 556663\n555110 555310\n798462 798922\n"
    p = run_tool("merge_masking_intervals", [], stdin=src)
    assert p.stdout == b"555110\t555310\n555941\t556663\n798462\t798922\n"


def test_fasta_softmask_intervals(tmp_path):
    ints = tmp_path / "m.int"
    ints.write_text("chr1 2 4\n")
    fa = b">chr1\nACGTACGT\n"
    p = run_tool("fasta_softmask_intervals", [str(ints)], stdin=fa)
    assert p.stdout == b">chr1\nACgtACGT\n"
    p = run_tool("fasta_softmask_intervals",
                 [str(ints), "--complement", "--mask=N"], stdin=fa)
    assert p.stdout == b">chr1\nNNgtNNNN\n".replace(b"gt", b"GT")


def test_lav_sort():
    lav = ("#:lav\n"
           "s {\n  x\n}\n"
           "a {\n  s 5\n  b 9 1\n  e 10 2\n}\n"
           "a {\n  s 7\n  b 3 4\n  e 4 5\n}\n"
           "#:eof\n")
    p = run_tool("lav_sort", ["--key=score"], stdin=lav.encode())
    body = p.stdout.decode()
    assert body.index("s 5") < body.index("s 7")
    p = run_tool("lav_sort", ["--key=-score"], stdin=lav.encode())
    body = p.stdout.decode()
    assert body.index("s 7") < body.index("s 5")
    p = run_tool("lav_sort", ["--key=beg1"], stdin=lav.encode())
    body = p.stdout.decode()
    assert body.index("b 3 4") < body.index("b 9 1")


AXT = ("0 cat 101 200 pig 11 110 + 5000\n"
       "ACGT\n"
       "ACGT\n"
       "\n"
       "1 cat 301 400 pig 51 150 - 4000\n"
       "AAAA\n"
       "AAAA\n")


def test_axt_compare(tmp_path):
    a = tmp_path / "a.axt"
    b = tmp_path / "b.axt"
    a.write_text(AXT)
    b.write_text(AXT.replace("5000", "5001"))
    assert run_tool("axt_compare", [str(a), str(a)]).returncode == 0
    p = run_tool("axt_compare", [str(a), str(b)])
    assert p.returncode == 1 and b"FAILURE" in p.stderr


def test_gfa_compare(tmp_path):
    a = tmp_path / "a.gfa"
    b = tmp_path / "b.gfa"
    a.write_text("d cmd one\na 1 2 3\nh 4 5 6\n")
    # d-lines (command echo) are ignored; other lines must match
    b.write_text("d cmd two\na 1 2 3\nh 4 5 6\n")
    assert run_tool("gfa_compare", [str(a), str(b)]).returncode == 0
    b.write_text("d cmd two\na 1 2 9\nh 4 5 6\n")
    assert run_tool("gfa_compare", [str(a), str(b)]).returncode == 1


def test_expand_scores_file():
    src = (b"gap_open_penalty   = 400\n"
           b"gap_extend_penalty = 30\n"
           b"\n"
           b"      A     C     G     T\n"
           b"A    85  -164   -70  -191\n"
           b"C  -164   100  -151   -70\n"
           b"G   -70  -151   100  -164\n"
           b"T  -191   -70  -164    85\n")
    out = run_tool("expand_scores_file", [], stdin=src).stdout.decode()
    assert "X=850" in out and "K=3000" in out and "Y=3400" in out
    assert "T=2" in out  # worst/best = -191/100 < -1.5


def test_probabilities_to_scores_hoxd70():
    p = run_tool("probabilities_to_scores",
                 ["--hoxd70", "--scaleto=100", "--nocreator"], stdin="",
                 text=True)
    lines = [l.split() for l in p.stdout.splitlines()
             if l and not l.startswith(("#", " "))]
    # HOXD70 recovered exactly from its own probabilities
    assert lines[0] == ["A", "91", "-114", "-31", "-123"]
    assert lines[1] == ["C", "-114", "100", "-125", "-31"]


def test_hassock_hash_cli():
    p = run_tool("hassock_hash", ["pig1", "--mod=17"], text=True, stdin="")
    from lastz_tpu.tools.hsx import hassock_hash
    want = "%d: pig1\n" % (hassock_hash(b"pig1") % 17)
    assert p.stdout == want


def test_tabular_to_maf(tmp_path):
    # one tiny alignment against an inline reference
    fa = tmp_path / "ref.fa"
    fa.write_text(">t\nACGTACGTAA\n>q\nACGTTCGT\n")
    tab = ("#name1\tzstart1\tend1\tname2\tstrand2\tzstart2+\tend2+\tcigarx\n"
           "t\t0\t8\tq\t+\t0\t8\t4=1X3=\n")
    p = run_tool("tabular_to_maf", [f"--sequences={fa}"],
                 stdin=tab, text=True)
    out = p.stdout.splitlines()
    assert out[0].startswith("##maf version=1")
    s_lines = [l for l in out if l.startswith("s ")]
    assert s_lines[0].split() == ["s", "t", "0", "8", "+", "10", "ACGTACGT"]
    assert s_lines[1].split() == ["s", "q", "0", "8", "+", "8", "ACGTTCGT"]
    a_line = [l for l in out if l.startswith("a ")][0]
    # 7 matches + 1 mismatch under HOXD70: 4*91+100+2*91 - 114 = ...
    from lastz_tpu.tools.tabular_to_maf import alignment_score
    assert a_line == "a score=%d" % alignment_score("ACGTACGT", "ACGTTCGT")


# -- tabular_tools machinery (reference tabular_tools/) ----------------------


def test_alignment_table_roundtrip(tmp_path):
    from lastz_tpu.tools.alignment_table import (AlignmentTable,
                                                 group_by)
    text = ("#name1\tzstart1\tend1\tname2\tstrand2\tzstart2+\tend2+\tid%\n"
            "chr1\t100\t200\tctgA\t+\t10\t110\t97.5\n"
            "chr1\t300\t420\tctgB\t-\t50\t170\t95.0\n"
            "chr2\t10\t60\tctgA\t+\t0\t50\t99.1\n")
    p = tmp_path / "t.general"
    p.write_text(text)
    t = AlignmentTable.from_file(
        str(p), preFill=True,
        requiredColumns=["name1", "zstart1", "end1", "name2"])
    rows = list(t)
    assert len(rows) == 3
    assert rows[0].name1 == "chr1" and rows[0].zstart1 == 100
    assert isinstance(rows[0].zstart1, int)
    assert abs(rows[1].id_ - 95.0) < 1e-9
    groups = group_by(rows, "name2")
    assert sorted(groups) == ["ctgA", "ctgB"]
    assert len(groups["ctgA"]) == 2

    import pytest
    with pytest.raises(ValueError, match="required column"):
        AlignmentTable.from_file(str(p), requiredColumns=["cigar"])


def test_alignment_table_from_real_run(tmp_path):
    """Table reader consumes our own --format=general output."""
    import io
    from lastz_tpu.cli import parse_options
    from lastz_tpu.pipeline import Pipeline
    from lastz_tpu.tools.alignment_table import AlignmentTable

    TD = "/root/reference/test_data"
    cfg = parse_options(
        [f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa",
         "--format=general:name1,zstart1,end1,name2,strand2,score"])
    buf = io.StringIO()
    Pipeline(cfg, buf).run()
    buf.seek(0)
    t = AlignmentTable.from_file(buf, preFill=True,
                                 requiredColumns=["name1", "score"])
    rows = list(t)
    assert rows and all(isinstance(r.score, int) for r in rows)


def test_cigar_utils():
    from lastz_tpu.tools.cigar_utils import (cigar_lengths,
                                             cigar_to_sam, merge_runs,
                                             parse_cigar)
    ops = parse_cigar("75M2I30M")
    assert ops == [("M", 75), ("I", 2), ("M", 30)]
    assert parse_cigar("M 75 I 2 M 30") == ops
    assert cigar_lengths(ops) == (105, 107)
    assert cigar_to_sam(ops) == "75M2I30M"
    assert merge_runs(parse_cigar("10=1X5=")) == [("M", 16)]
