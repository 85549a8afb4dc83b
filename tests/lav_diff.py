"""Semantic LAV comparison for golden tests.

Equivalent to the reference tools/lav_compare.py: the d-stanza (which
embeds the program name/version and command line) is ignored; all
other stanzas must match exactly.
"""

from __future__ import annotations


def _strip_d_stanzas(text: str) -> list[str]:
    out = []
    lines = text.splitlines()
    i = 0
    while i < len(lines):
        line = lines[i]
        if line.startswith("d {"):
            while i < len(lines) and lines[i] != "}":
                i += 1
            i += 1
            continue
        out.append(line)
        i += 1
    return out


def lav_equal(golden_path: str, got_text: str) -> tuple[bool, str]:
    with open(golden_path) as f:
        golden = _strip_d_stanzas(f.read())
    mine = _strip_d_stanzas(got_text)
    if golden == mine:
        return True, ""
    for i, (a, b) in enumerate(zip(golden, mine)):
        if a != b:
            return False, f"first difference at stripped line {i + 1}:\n  golden: {a}\n  got:    {b}"
    return False, f"length mismatch: golden {len(golden)} lines, got {len(mine)}"


if __name__ == "__main__":
    import sys
    if len(sys.argv) != 3:
        sys.exit("usage: lav_diff.py GOLDEN GOT")
    with open(sys.argv[2]) as f:
        ok, msg = lav_equal(sys.argv[1], f.read())
    if not ok:
        print(msg)
        sys.exit(1)
