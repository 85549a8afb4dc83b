"""The vectorized FASTA fast path (io/sequence._parse_fasta_fast)
must produce exactly the line loop's records on \\r-free inputs —
headers verbatim, whitespace stripped from bodies, content before the
first '>' discarded, blank lines and missing trailing newlines
handled."""

import numpy as np

from lastz_tpu.io.sequence import (_parse_fasta_bytes,
                                   _parse_fasta_fast,
                                   _parse_fasta_lines)

CASES = [
    b"",
    b">a\nACGT\n",
    b">a\nACGT",                       # no trailing newline
    b">a\nAC GT\nTT\tAA\n",            # spaces/tabs inside body
    b">a\n\nACGT\n\n\n>b\nTTTT\n",     # blank lines
    b">a with spaces  and > inside\nACGT\n",
    b">a\nAC>GT\n",                    # '>' not at line start
    b"leading\njunk\n>a\nACGT\n",      # pre-header content dropped
    b"ACGT\nTTTT\n",                   # headerless file
    b">empty1\n>empty2\n>c\nGG\n",     # empty-bodied records
    b">a",                             # header only, no newline
]


def test_fast_path_matches_line_loop():
    rng = np.random.default_rng(0)
    alpha = np.frombuffer(b"ACGTNacgtn", dtype=np.uint8)
    big = b">r1 desc\n" + b"\n".join(
        bytes(alpha[rng.integers(0, 10, 61)]) for _ in range(300)
    ) + b"\n>r2\n" + bytes(alpha[rng.integers(0, 10, 5000)]) + b"\n"
    for data in CASES + [big]:
        assert _parse_fasta_fast(data) == _parse_fasta_lines(data), data
        assert _parse_fasta_bytes(data) == _parse_fasta_lines(data)


def test_crlf_falls_back_to_line_loop():
    data = b">a\r\nACGT\r\nTT\r\n>b\r\nGGGG\r\n"
    recs = _parse_fasta_bytes(data)
    assert [r[0] for r in recs] == [b"ACGTTT", b"GGGG"]
    assert [r[1] for r in recs] == [">a", ">b"]
