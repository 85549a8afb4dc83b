"""Command-line interface, compatible with the reference option surface.

Accepts the blastz one-letter shortcuts (W=, T=, C=, K=, L=, H=, O=,
E=, X=, Y=, Z=, M=, G=, R=) and the --long options of the reference
(lastz.c:5357+), mapped onto Config.
"""

from __future__ import annotations

import sys

from .config import (
    Config, ScoreThreshold,
    GFEX_NO_EXTEND, GFEX_XDROP, GFEX_EXACT, GFEX_MISMATCH_BASE,
    HIT_SIMPLE, HIT_RECOVER,
)
from .core.seeds import SEED_12OF19, SEED_14OF22, match_seed


class UsageError(Exception):
    pass


# user-selectable --format= names (reference lastz.c:6975-7482)
KNOWN_FORMATS = {
    "gfa", "gfanoscore", "lav", "lav+", "lav+text", "text+lav", "lavscore",
    "axt", "axt+", "axt:size2", "waxt", "maf", "maf+", "maf-",
    "sam", "sam-", "softsam", "softsam-", "hardsam", "hardsam-",
    "cigar", "general", "general-", "segments", "mapping",
    "paf", "paf:wfmash", "blastn", "blastn-",
    "text", "ztext", "comp", "identity", "deseed", "none",
    "rdotplot", "rdotplot+score",
}


def parse_threshold(text: str) -> ScoreThreshold:
    """Parse K=/L= values: plain score, '<n>%', or 'top<n>%'."""
    t = text.strip()
    if t.lower().startswith("top") and t.endswith("%"):
        return ScoreThreshold("P", p=float(t[3:-1]) / 100.0)
    if t.endswith("c"):
        return ScoreThreshold("C", c=int(t[:-1]))
    return ScoreThreshold("S", s=int(float(t)))


def parse_options(argv: list[str]) -> Config:
    cfg = Config()
    positional = []
    have_with_trans = False
    have_gapped_thresh = False
    have_max_identity = False
    have_step = False
    seed_string = None
    args_parts = []

    i = 0
    while i < len(argv):
        arg = argv[i]
        i += 1
        args_parts.append(arg)
        val = arg.split("=", 1)[1] if "=" in arg else None

        import re as _re
        if not arg.startswith("-") and not _re.match(r"^[A-Z]=", arg):
            positional.append(arg)
            args_parts.pop()
            continue

        # one-letter blastz shortcuts
        if arg == "T=0":
            cfg.with_trans = 0
            have_with_trans = True
        elif arg == "T=1":
            seed_string = SEED_12OF19
            cfg.with_trans = 1
            have_with_trans = True
        elif arg == "T=2":
            seed_string = SEED_12OF19
            cfg.with_trans = 0
            have_with_trans = True
        elif arg == "T=3":
            seed_string = SEED_14OF22
            cfg.with_trans = 1
            have_with_trans = True
        elif arg == "T=4":
            seed_string = SEED_14OF22
            cfg.with_trans = 0
            have_with_trans = True
        elif arg.startswith("W="):
            seed_string = match_seed(int(val))
            if not have_with_trans:
                cfg.with_trans = 0
                have_with_trans = True
        elif arg.startswith("Z="):
            cfg.step = int(val)
            have_step = True
        elif arg == "C=0":
            cfg.chain = False
            cfg.gapped_extend = True
        elif arg == "C=1":
            cfg.chain = True
            cfg.gapped_extend = False
        elif arg == "C=2":
            cfg.chain = True
            cfg.gapped_extend = True
        elif arg == "C=3":
            cfg.chain = False
            cfg.gapped_extend = False
        elif arg.startswith("K="):
            cfg.hsp_threshold = parse_threshold(val)
        elif arg.startswith("L="):
            cfg.gapped_threshold = parse_threshold(val)
            have_gapped_thresh = True
        elif arg.startswith("H="):
            cfg.inner_threshold = int(float(val))
        elif arg.startswith("O="):
            _set_gap(cfg, open_=int(val))
        elif arg.startswith("E="):
            _set_gap(cfg, extend=int(val))
        elif arg.startswith("X="):
            cfg.x_drop = int(val)
        elif arg.startswith("Y="):
            cfg.y_drop = int(val)
        elif arg.startswith("M="):
            cfg.dynamic_masking = int(val)
            _fit_census_kind(cfg)
        elif arg.startswith("G="):
            cfg.chain_diag = int(val)
        elif arg.startswith("R="):
            cfg.chain_anti = int(val)
        elif arg.startswith("--seed="):
            if val == "12of19":
                seed_string = SEED_12OF19
            elif val == "14of22":
                seed_string = SEED_14OF22
            elif val.startswith("match"):
                n = val[5:].strip("()")
                seed_string = match_seed(int(n))
                if not have_with_trans:
                    cfg.with_trans = 0
                    have_with_trans = True
            else:
                seed_string = val
        elif arg in ("--transition", "--trans", "--transitions"):
            cfg.with_trans = 1
            have_with_trans = True
        elif arg in ("--transition=2", "--trans=2", "--transitions=2"):
            cfg.with_trans = 2
            have_with_trans = True
        elif arg in ("--notransition", "--notrans", "--notransitions"):
            cfg.with_trans = 0
            have_with_trans = True
        elif arg.startswith("--step="):
            cfg.step = int(val)
            have_step = True
        elif arg.startswith("--word="):
            cfg.max_index_bits = int(val)
        elif arg == "--strand=both" or arg == "--both":
            cfg.which_strand = 1
        elif arg in ("--strand=plus", "--plus"):
            cfg.which_strand = 0
        elif arg in ("--strand=minus", "--minus"):
            cfg.which_strand = -1
        elif arg == "--gfextend":
            cfg.gf_extend = GFEX_XDROP
        elif arg in ("--nogfextend", "--nogfx"):
            cfg.gf_extend = GFEX_NO_EXTEND
        elif arg in ("--justhits", "--hitsonly"):
            cfg.gf_extend = GFEX_NO_EXTEND
            cfg.gapped_extend = False
        elif arg == "--chain":
            cfg.chain = True
        elif arg == "--nochain":
            cfg.chain = False
        elif arg.startswith("--chain="):
            cfg.chain = True
            d, a = val.split(",")
            cfg.chain_diag, cfg.chain_anti = int(d), int(a)
        elif arg == "--gapped":
            cfg.gapped_extend = True
        elif arg in ("--nogapped", "--ungapped", "--nogappedextension"):
            cfg.gapped_extend = False
        elif arg.startswith("--xdrop="):
            cfg.x_drop = int(val)
        elif arg.startswith("--ydrop="):
            cfg.y_drop = int(val)
        elif arg == "--noytrim":
            cfg.y_drop_untrimmed = True
        elif arg.startswith("--hspthresh=") or arg.startswith("--hspthreshold="):
            cfg.hsp_threshold = parse_threshold(val)
        elif arg.startswith("--gappedthresh=") or arg.startswith("--gappedthreshold="):
            cfg.gapped_threshold = parse_threshold(val)
            have_gapped_thresh = True
        elif arg == "--entropy":
            cfg.entropic_hsp = True
        elif arg == "--noentropy":
            cfg.entropic_hsp = False
        elif arg in ("--self",):
            cfg.self_compare = True
            cfg.cloned_query = True
            cfg.inhibit_trivial = True
        elif arg == "--mirror":
            cfg.mirror_hsp = True
        elif arg == "--nomirror":
            cfg.mirror_hsp = False
            cfg.mirror_gapped = False
        elif arg == "--notrivial":
            cfg.inhibit_trivial = True
        elif arg.startswith("--exact="):
            cfg.gf_extend = GFEX_EXACT
            cfg.hsp_threshold = ScoreThreshold("S", int(val))
            cfg.entropic_hsp = False
        elif arg.startswith("--mismatch="):
            parts = val.split(",")
            n = int(parts[0])
            cfg.gf_extend = GFEX_MISMATCH_BASE + n
            if len(parts) > 1:
                cfg.hsp_threshold = ScoreThreshold("S", int(parts[1]))
            cfg.entropic_hsp = False
        elif arg.startswith("--twins="):
            v = val
            if ".." in v:
                lo, hi = v.split("..")
            elif ":" in v:
                lo, hi = v.split(":")
            else:
                lo, hi = "0", v
            cfg.twin_min_gap = int(lo)
            cfg.twin_max_gap = int(hi)
        elif arg == "--notwins":
            cfg.twin_min_gap = None
            cfg.twin_max_gap = None
        elif arg == "--recoverseeds":
            cfg.basic_hit_type = HIT_RECOVER
        elif arg.startswith("--filter="):
            parts = val.split(",")
            if len(parts) == 2:
                cfg.max_transversions = int(parts[0])
                cfg.min_matches = int(parts[1])
            else:
                cfg.min_matches = int(parts[0])
        elif arg.startswith("--masking="):
            cfg.dynamic_masking = int(val)
            _fit_census_kind(cfg)
        elif arg == "--census" or arg == "--census=on":
            cfg.report_census = True
            if not cfg.census_kind:
                cfg.census_kind = "B"
        elif arg in ("--nocensus", "--census=off"):
            cfg.report_census = False
        elif arg.startswith("--census="):
            cfg.report_census = True
            if not cfg.census_kind:
                cfg.census_kind = "B"
            cfg.census_filename = val
        elif arg == "--census16" or arg.startswith("--census16="):
            if cfg.dynamic_masking >= 65535:
                raise SystemExit(
                    "--census16 can't support --masking > %d"
                    % (65535 - 1))
            cfg.report_census = True
            cfg.census_kind = "W"
            if "=" in arg:
                cfg.census_filename = val
        elif arg == "--census32" or arg.startswith("--census32="):
            cfg.report_census = True
            cfg.census_kind = "L"
            if "=" in arg:
                cfg.census_filename = val
        elif arg.startswith("--inner="):
            cfg.inner_threshold = int(float(val))
        elif arg.startswith("--identity="):
            lo, _, hi = val.partition("..")
            cfg.min_identity = float(lo) / 100.0
            cfg.max_identity = float(hi) / 100.0 if hi else 1.0
            have_max_identity = True
        elif arg.startswith("--coverage="):
            lo, _, hi = val.partition("..")
            cfg.min_coverage = float(lo) / 100.0
            cfg.max_coverage = float(hi) / 100.0 if hi else 1.0
        elif arg.startswith("--continuity="):
            lo, _, hi = val.partition("..")
            cfg.min_continuity = float(lo) / 100.0
            cfg.max_continuity = float(hi) / 100.0 if hi else 1.0
        elif arg.startswith("--format="):
            fmt = val
            if fmt.startswith("general:"):
                cfg.output_format = "general"
                cfg.output_info = fmt[len("general:"):]
            elif fmt.startswith("general-:"):
                cfg.output_format = "general-"
                cfg.output_info = fmt[len("general-:"):]
            elif fmt in ("diff", "diffs", "difference", "differences"):
                cfg.output_format = "differences"
            elif fmt in ("diff-", "diffs-", "difference-", "differences-"):
                cfg.output_format = "differences-"
            elif fmt in ("rdotplot", "rdotplot+score"):
                cfg.output_format = fmt
                cfg.de_gapify_output = True
            elif fmt == "zerotext":
                cfg.output_format = "ztext"
            elif fmt in ("istats", "infstats") or (
                    (fmt.startswith("istats(") or fmt.startswith("infstats("))
                    and fmt.endswith(")")):
                # inference stats: defaults the identity cap to 70%
                # (lastz.c:7447-7473)
                cfg.output_format = "istats"
                if "(" in fmt:
                    pct = fmt[fmt.index("(") + 1 : -1].rstrip("%")
                    try:
                        pct_val = float(pct)
                    except ValueError:
                        raise UsageError(f"unknown format {val}")
                    if not 0 <= pct_val <= 100:
                        raise UsageError(f"unknown format {val}")
                    cfg.max_identity = pct_val / 100.0
                    have_max_identity = True
                elif not have_max_identity:
                    cfg.max_identity = 0.70
            elif fmt in KNOWN_FORMATS:
                cfg.output_format = fmt
            else:
                raise UsageError(f"unknown format {fmt}")
        elif arg == "--gfa":
            cfg.output_format = "gfa"
        elif arg == "--lav":
            cfg.output_format = "lav"
        elif arg == "--axt":
            cfg.output_format = "axt"
        elif arg == "--maf":
            cfg.output_format = "maf"
        elif arg == "--maf-":
            cfg.output_format = "maf-"
        elif arg == "--sam":
            cfg.output_format = "sam"
        elif arg.startswith("--segments="):
            cfg.segments_filename = val
        elif arg.startswith("--anchors="):
            cfg.segments_filename = val  # alias (reference synonym)
        elif arg.startswith("--scores=") or arg.startswith("Q="):
            from .core.scoring import read_score_file
            info = read_score_file(val)
            cfg.scoring = info["scoring"]
            if "x_drop" in info:
                cfg.x_drop = info["x_drop"]
            if "y_drop" in info:
                cfg.y_drop = info["y_drop"]
            if "hsp_threshold" in info:
                cfg.hsp_threshold = ScoreThreshold("S", info["hsp_threshold"])
            if "gapped_threshold" in info:
                cfg.gapped_threshold = ScoreThreshold(
                    "S", info["gapped_threshold"])
                have_gapped_thresh = True
            if "step" in info:
                cfg.step = info["step"]
            if "seed" in info:
                seed_string = info["seed"]
        elif arg.startswith("--match="):
            # --match=<reward>[,<penalty>]: simple match/mismatch scores
            import numpy as _np
            parts = val.split(",")
            reward = int(parts[0])
            penalty = int(parts[1]) if len(parts) > 1 else reward
            from .core.scoring import new_dna_score_set
            tmpl = _np.full((4, 4), -penalty, dtype=_np.int64)
            _np.fill_diagonal(tmpl, reward)
            gap_open = cfg.scoring.gap_open if cfg.scoring else 400
            gap_extend = cfg.scoring.gap_extend if cfg.scoring else 30
            cfg.scoring = new_dna_score_set(
                template=tmpl, gap_open=gap_open, gap_extend=gap_extend)
        elif arg.startswith("--gap="):
            if "," in val:
                o, e = val.split(",")
                _set_gap(cfg, open_=int(o), extend=int(e))
            else:
                _set_gap(cfg, extend=int(val))
        elif arg.startswith("--ambiguous=") or arg.startswith("--ambig="):
            parts = val.split(",")
            kind = parts[0].lower()
            if kind in ("n", "iupac"):
                cfg.n_is_ambiguous = True
                cfg.allow_ambi_dna = kind == "iupac"
                # one number => mismatch penalty; two => match,mismatch
                if len(parts) == 2:
                    cfg.ambi_mismatch = int(parts[1])
                elif len(parts) >= 3:
                    cfg.ambi_match = int(parts[1])
                    cfg.ambi_mismatch = int(parts[2])
            else:
                raise UsageError(f"unknown ambiguity kind {kind}")
        elif arg.startswith("--maxwordcount="):
            if val.endswith("%"):
                cfg.word_count_keep = float(val[:-1]) / 100.0
            else:
                cfg.word_count_limit = int(val)
        elif arg == "--markend":
            cfg.end_comment = True
        elif arg.startswith("--output="):
            cfg.output_filename = val
        elif arg.startswith("--rdotplot+score="):
            cfg.dotplot_filename = val
            cfg.dotplot_keys = "rdotplot+score"
        elif arg.startswith("--rdotplot="):
            cfg.dotplot_filename = val
            cfg.dotplot_keys = "rdotplot"
        elif arg.startswith("--axt="):
            cfg.axt_filename = val
        elif arg.startswith("--maf="):
            cfg.maf_filename = val
        elif arg in ("--anyornone", "--stopafterone"):
            cfg.hsp_immediate = True
            cfg.search_limit = 1
            cfg.search_limit_warn = False
            cfg.search_limit_keep = False
        elif arg.startswith("--limitperquery=") or arg.startswith("--queryhsplimit="):
            v = val
            if v.endswith("+"):
                cfg.search_limit_keep = True
                v = v[:-1]
            cfg.hsp_immediate = True
            cfg.search_limit = int(v)
        elif arg == "--markmismatches" or arg == "--action:markmismatches":
            cfg.sam_mark_mismatches = True
        elif arg.startswith("--readgroup="):
            cfg.read_group = val
        elif arg.startswith("--allocate:traceback=") or arg.startswith("--traceback="):
            t = val.upper()
            mult = 1
            if t.endswith("M"):
                mult = 1 << 20
                t = t[:-1]
            elif t.endswith("K"):
                mult = 1 << 10
                t = t[:-1]
            elif t.endswith("G"):
                mult = 1 << 30
                t = t[:-1]
            cfg.traceback_mem = int(float(t) * mult)
        elif arg.startswith("--writecapsule="):
            if cfg.read_capsule:
                raise UsageError(
                    "can't use --writecapsule with --targetcapsule")
            cfg.capsule_filename = val
            cfg.write_capsule = True
        elif arg.startswith("--targetcapsule="):
            if cfg.write_capsule:
                raise UsageError(
                    "can't use --targetcapsule with --writecapsule")
            cfg.capsule_filename = val
            cfg.read_capsule = True
        elif arg == "--infer" or arg.startswith("--infer="):
            cfg.infer_scores = True
            cfg.infer_only = False
            if val is not None:
                cfg.infer_control_filename = val
        elif arg == "--inferonly" or arg.startswith("--inferonly="):
            cfg.infer_scores = True
            cfg.infer_only = True
            if val is not None:
                cfg.infer_control_filename = val
        elif arg == "--infscores" or arg.startswith("--infscores="):
            cfg.infer_scores = True
            if val is not None:
                cfg.infer_scores_filename = val
        elif arg in ("--doublescore", "--scoretype=double"):
            # equivalent of the reference's lastz_D build
            cfg.score_type = "D"
            args_parts.pop()
        elif arg == "--version":
            print("lastz_tpu 0.1.0")
            sys.exit(0)
        elif arg.startswith("--"):
            raise UsageError(f"unknown option {arg}")
        else:
            raise UsageError(f"unknown option {arg}")

    if cfg.read_capsule:
        # the one positional (if any) is the query (lastz.c:7755-7770)
        if len(positional) >= 2:
            raise UsageError("can't use --targetcapsule with two queries")
        if len(positional) == 1:
            cfg.seq2_filename = positional[0]
        if have_step:
            raise UsageError("can't use --step with --targetcapsule")
        if seed_string is not None:
            raise UsageError("can't use --seed with --targetcapsule")
        if cfg.dynamic_masking > 0:
            raise UsageError("can't use --masking with --targetcapsule")
        if cfg.word_count_limit > 0 or cfg.word_count_keep > 0:
            raise UsageError("can't use --maxwordcount with --targetcapsule")
        if cfg.max_index_bits != 28:
            raise UsageError("can't use --word with --targetcapsule")
    elif cfg.write_capsule:
        if len(positional) >= 2:
            raise UsageError(
                "--writecapsule can't be used when you specify a query file")
        if cfg.infer_scores:
            raise UsageError("can't use --infer with --writecapsule")
        if len(positional) >= 1:
            cfg.seq1_filename = positional[0]
    else:
        if len(positional) >= 1:
            cfg.seq1_filename = positional[0]
        if len(positional) >= 2:
            cfg.seq2_filename = positional[1]
    if cfg.self_compare and cfg.seq2_filename is None:
        cfg.seq2_filename = cfg.seq1_filename
    if seed_string is not None:
        cfg.seed_string = seed_string

    # reconstruct the args string as the reference does (all args with
    # trailing spaces, file names removed)
    cfg.args = "".join(p + " " for p in args_parts)
    return cfg


def _fit_census_kind(cfg):
    """Pick a census counter width wide enough for the masking threshold
    (reference lastz.c:6560-6578)."""
    n = cfg.dynamic_masking
    if cfg.census_kind == "B" and n >= 255:
        cfg.census_kind = ""
    elif cfg.census_kind == "W" and n >= 65535:
        raise SystemExit("--census16 can't support --masking > %d" % 65534)
    if not cfg.census_kind:
        if n < 255:
            cfg.census_kind = "B"
        elif n < 65535:
            cfg.census_kind = "W"
        else:
            cfg.census_kind = "L"


def _set_gap(cfg, open_=None, extend=None):
    from .core.scoring import new_dna_score_set

    if cfg.scoring is None:
        cfg.scoring = new_dna_score_set()
    if open_ is not None:
        cfg.scoring.gap_open = open_
        cfg.scoring.gap_open_set = True
    if extend is not None:
        cfg.scoring.gap_extend = extend
        cfg.scoring.gap_extend_set = True


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    try:
        cfg = parse_options(argv)
    except UsageError as e:
        print(f"lastz_tpu: {e}", file=sys.stderr)
        return 1
    if cfg.seq1_filename is None and not cfg.read_capsule:
        print("usage: lastz_tpu target [query] [options]", file=sys.stderr)
        return 1
    from .pipeline import Pipeline

    out = sys.stdout
    close = False
    if getattr(cfg, "output_filename", None):
        out = open(cfg.output_filename, "w")
        close = True
    try:
        try:
            return _run(cfg, out)
        except ValueError as e:
            # user-facing input errors (missing contigs, bad subranges,
            # malformed files) exit like the reference's suicide()
            print(f"FAILURE: {e}", file=sys.stderr)
            return 1
    finally:
        if close:
            out.close()


def _run(cfg, out):
    from .pipeline import Pipeline

    if cfg.infer_scores:
        from .infer import drive_scoring_inference
        inferred = drive_scoring_inference(
            cfg, cfg.infer_control_filename, cfg.infer_scores_filename)
        if cfg.infer_only:
            return 0
        cfg.scoring = inferred
        cfg.masked_scoring = None
    Pipeline(cfg, out).run()
    return 0


if __name__ == "__main__":
    sys.exit(main())
