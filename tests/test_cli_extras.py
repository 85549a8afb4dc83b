"""CLI surface extras: --tableonly/--showtable dumps, --include option
files, --yasra expanders, --progress, --queryhspbest conflicts."""

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


def norm(text):
    return text.replace(f"{TD}/", "").replace("test_data/", "")


TABLE_CASES = [
    ("tableonly_w8_count.txt", ["--tableonly=count", "W=8"]),
    ("tableonly_w8_andcount.txt", ["--tableonly=andcount", "W=8"]),
    ("tableonly_dist.txt", ["--tableonly=distribution"]),
    ("tableonly_ow_count.txt",
     ["--tableonly=count", "--seed=111111111111111", "--word=24"]),
]


@pytest.mark.parametrize("golden,args", TABLE_CASES,
                         ids=[c[0] for c in TABLE_CASES])
def test_tableonly(golden, args):
    got = run([f"{TD}/pseudocat.fa"] + args)
    with open(os.path.join(G, golden)) as f:
        want = f.read()
    assert norm(got) == norm(want)


def test_include_file():
    with tempfile.NamedTemporaryFile("w", suffix=".opts",
                                     delete=False) as f:
        f.write("# options file\n--nogapped W=8\nT=0\n")
        path = f.name
    try:
        cfg = parse_options(
            [f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa",
             f"--include={path}"])
        assert cfg.gapped_extend is False
        assert cfg.with_trans == 0
    finally:
        os.unlink(path)


def test_nested_include_rejected():
    with tempfile.NamedTemporaryFile("w", suffix=".opts",
                                     delete=False) as f:
        f.write(f"--include={f.name}\n")
        path = f.name
    try:
        with pytest.raises(UsageError):
            parse_options([f"{TD}/pseudocat.fa", f"--include={path}"])
    finally:
        os.unlink(path)


def test_yasra_expander():
    cfg = parse_options([f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa",
                         "--yasra90"])
    assert cfg.step == 20
    assert cfg.with_trans == 0
    assert cfg.min_identity == 0.90
    assert cfg.y_drop_untrimmed is True
    assert cfg.n_is_ambiguous is True
    assert cfg.scoring.gap_open == 6
    # old-version expander lacks the ambiguity/noytrim suffix
    cfg_old = parse_options([f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa",
                             "--yasra90:1.02.40"])
    assert cfg_old.n_is_ambiguous is False


def test_queryhspbest_conflicts_with_hsplimit():
    with pytest.raises(UsageError):
        parse_options([f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa",
                       "--queryhsplimit=5", "--queryhspbest=5"])


def test_progress_goes_to_stderr(capsys):
    run([f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa", "--nogapped",
         "--progress=1", "W=12", "--notransition"])
    err = capsys.readouterr().err
    assert "processing query 1: pig1" in err
    assert "processing query 3: pig3" in err


CHORES_FMT = ("--format=general:chore,name2,strand2,zstart1,end1,"
              "zstart2+,end2+,score")


def test_chores_general():
    got = run([f"{TD}/pseudocat.fa",
               f"{TD}/pseudopig.2bit[chores={G}/chores.txt]", CHORES_FMT])
    with open(os.path.join(G, "chores.general")) as f:
        want = f.read()
    assert norm(got) == norm(want)


def test_chores_lav():
    got = run([f"{TD}/pseudocat.fa",
               f"{TD}/pseudopig.2bit[chores={G}/chores.txt]"])
    with open(os.path.join(G, "chores.lav")) as f:
        want = f.read()

    def strip(t):
        return "\n".join(l for l in norm(t).split("\n")
                         if not l.lstrip().startswith('"lastz'))
    assert strip(got) == strip(want)


def test_chores_option_form_and_conflicts():
    got = run([f"{TD}/pseudocat.fa", f"{TD}/pseudopig.2bit",
               f"--chores={G}/chores.txt",
               "--format=general:chore,score"])
    assert got.splitlines()[1].startswith("AAA\t")
    with pytest.raises(UsageError):
        parse_options([f"{TD}/pseudocat.fa", f"{TD}/pseudopig.2bit",
                       f"--chores={G}/chores.txt", "--inferonly"])


def test_chores_bad_target_name():
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".chores",
                                     delete=False) as f:
        f.write("dog 1 100 pig1 id=X\n")
        path = f.name
    try:
        with pytest.raises(SystemExit):
            run([f"{TD}/pseudocat.fa",
                 f"{TD}/pseudopig.2bit[chores={path}]"])
    finally:
        os.unlink(path)


# -- --band= (lastz.c:7818-7827, 8757-8777; seed_search.c:845) ---------------


def test_band_requires_self_and_plus():
    with pytest.raises(UsageError, match=r"--band=<width> requires --self"):
        parse_options([f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa",
                       "--band=100"])
    with pytest.raises(UsageError,
                       match=r"--band=<width> requires --strand=plus"):
        parse_options([f"{TD}/pseudocat.fa", "--self", "--band=100"])
    with pytest.raises(SystemExit, match="must be positive"):
        parse_options([f"{TD}/pseudocat.fa", "--self", "--band=0"])
    with pytest.raises(SystemExit, match="cannot be more than"):
        parse_options([f"{TD}/pseudocat.fa", "--self", "--band=101k"])


def test_band_restricts_hits(tmp_path):
    """All HSPs from a banded self-alignment stay within the band;
    an unbanded run of the same input reaches farther."""
    import numpy as np
    rng = np.random.default_rng(7)
    far = "".join("ACGT"[i] for i in rng.integers(0, 4, 3000))
    near = "".join("ACGT"[i] for i in rng.integers(0, 4, 1500))
    mid = "".join("ACGT"[i] for i in rng.integers(0, 4, 300))
    seq = far + near + mid + near + "".join(
        "ACGT"[i] for i in rng.integers(0, 4, 2000)) + far
    fa = tmp_path / "selfrep.fa"
    fa.write_text(">rep\n" + seq + "\n")
    base = [str(fa), "--self", "--strand=plus", "--nogapped",
            "--format=general:start1,start2,end1,end2"]
    wide = run(base)
    narrow = run(base + ["--band=2000"])

    def offsets(text):
        out = []
        for line in text.splitlines():
            if line.startswith("#") or not line.strip():
                continue
            s1, s2, e1, e2 = map(int, line.split()[:4])
            out.append(s2 - s1)
        return out

    assert any(abs(d) > 2000 for d in offsets(wide))
    assert offsets(narrow)
    assert all(abs(d) <= 2000 + 64 for d in offsets(narrow))


def test_stats_counters(tmp_path, capsys):
    """--stats[=file]: per-module counters (the reference's
    collect_stats build analogue, lastz.c:1796-1808)."""
    out = tmp_path / "stats.txt"
    run([f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa",
         "--format=none", f"--stats={out}"])
    text = out.read_text()
    assert "target length: 18,803" in text
    assert "raw seed hits:" in text
    assert "alignments:" in text
