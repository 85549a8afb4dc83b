"""--queryhsplimit family: query-discard semantics, keep variants, and
the stderr warnings (reference lastz.c:5988-6048, seed_search.c:3795)."""

import io
import os

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
    return "\n".join(
        l for l in text.replace(f"{TD}/", "").replace("test_data/", "")
        .split("\n") if not l.lstrip().startswith('"lastz'))


def golden(name):
    with open(os.path.join(G, name)) as f:
        return f.read()


def test_queryhsplimit_discards_whole_query(capsys):
    got = run([f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa",
               "--queryhsplimit=4", "--nogapped"])
    assert norm(got) == norm(golden("qhsplimit4.lav"))
    err = capsys.readouterr().err
    assert err == golden("qhsplimit4.err")


def test_queryhsplimit_keep_reports_up_to_limit(capsys):
    got = run([f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa",
               "--queryhsplimit+=4", "--nogapped"])
    assert norm(got) == norm(golden("qhsplimit4keep.lav"))
    err = capsys.readouterr().err
    assert 'contains more than 4 HSPs' in err


def test_queryhsplimit_nowarn_is_silent_but_counts(capsys):
    run([f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa",
         "--queryhsplimit=nowarn:4", "--nogapped"])
    err = capsys.readouterr().err
    assert "WARNING" not in err
    assert "queries exceeded the HSP limit" in err


def test_querydepth_discards_strand(capsys):
    # paired-bases cap (gapped_extend.c:1444-1459): minus strands of all
    # three pigs blow the 0.05x depth cap and are discarded with warnings
    got = run([f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa",
               "--querydepth=0.05"])
    assert norm(got) == norm(golden("querydepth005.lav"))
    assert capsys.readouterr().err == golden("querydepth005.err")


def test_queryhsplimit_parsing():
    base = [f"{TD}/pseudocat.fa", f"{TD}/pseudopig.fa"]
    cfg = parse_options(base + ["--queryhsplimit=1K"])
    assert (cfg.search_limit, cfg.search_limit_warn,
            cfg.search_limit_keep, cfg.hsp_immediate) \
        == (1000, True, False, False)
    cfg = parse_options(base + ["--queryhsplimit=keep,nowarn:7"])
    assert (cfg.search_limit_warn, cfg.search_limit_keep) == (False, True)
    cfg = parse_options(base + ["--limitperquery=3"])
    assert (cfg.search_limit, cfg.hsp_immediate,
            cfg.search_limit_warn) == (3, True, False)
    # the reference's non-plus keep: form FAILS ("keep:4" parsed from '=')
    with pytest.raises(SystemExit):
        parse_options(base + ["--queryhsplimit=keep:4"])
    with pytest.raises(UsageError):
        parse_options(base + ["--queryhspbest=5", "--queryhsplimit=5"])
