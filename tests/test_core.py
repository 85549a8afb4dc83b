"""Unit tests for core encodings, scoring, and seed packing."""

import numpy as np
import pytest

from lastz_tpu.core.encoding import (
    NUC_TO_BITS, UPPER_NUC_TO_BITS, NUC_TO_COMPLEMENT, reverse_complement)
from lastz_tpu.core.scoring import (
    new_dna_score_set, masked_score_set, entropy,
    VERY_BAD_SCORE, HOXD70)
from lastz_tpu.core.seeds import parse_seed, SEED_12OF19


def test_nuc_to_bits():
    assert NUC_TO_BITS[ord("A")] == 0
    assert NUC_TO_BITS[ord("c")] == 1
    assert NUC_TO_BITS[ord("G")] == 2
    assert NUC_TO_BITS[ord("t")] == 3
    assert NUC_TO_BITS[ord("N")] == -1
    assert UPPER_NUC_TO_BITS[ord("a")] == -1
    assert UPPER_NUC_TO_BITS[ord("A")] == 0


def test_complement_map():
    s = np.frombuffer(b"ACGTacgtNRYKM", dtype=np.uint8)
    rc = reverse_complement(s)
    assert rc.tobytes() == b"KMRYNacgtACGT"


def test_revcomp_roundtrip():
    rng = np.random.default_rng(0)
    s = rng.choice(np.frombuffer(b"ACGTacgtN", dtype=np.uint8), size=100)
    assert np.array_equal(reverse_complement(reverse_complement(s)), s)


def test_score_set_defaults():
    ss = new_dna_score_set()
    assert ss.sub[ord("A"), ord("A")] == 91
    assert ss.sub[ord("a"), ord("A")] == 91
    assert ss.sub[ord("C"), ord("G")] == -125
    assert ss.sub[ord("A"), ord("N")] == -100
    assert ss.sub[ord("A"), ord("X")] == -1000
    assert ss.sub[0, ord("A")] == VERY_BAD_SCORE
    assert ss.sub[ord("A"), 0] == VERY_BAD_SCORE
    # the X row/column covers NUL too (fill-order semantics)
    assert ss.sub[ord("X"), 0] == -1000
    assert ss.gap_open == 400 and ss.gap_extend == 30


def test_masked_score_set():
    ss = new_dna_score_set()
    ms = masked_score_set(ss)
    assert ms.sub[ord("a"), ord("A")] == -1000
    assert ms.sub[ord("A"), ord("t")] == -1000
    assert ms.sub[ord("N"), ord("A")] == -1000
    assert ms.sub[ord("A"), ord("A")] == 91
    # original untouched
    assert ss.sub[ord("a"), ord("A")] == 91


def test_entropy_short_is_one():
    s = np.frombuffer(b"ACGTACGTACGTACGTACG", dtype=np.uint8)
    assert entropy(s, s) == 1.0


def test_entropy_uniform():
    s = np.frombuffer(b"ACGT" * 10, dtype=np.uint8)
    assert abs(entropy(s, s) - 1.0) < 1e-12
    t = np.frombuffer(b"AAAA" * 10, dtype=np.uint8)
    assert entropy(t, t) == 0.0


def test_seed_12of19():
    seed = parse_seed(SEED_12OF19)
    assert seed.length == 19
    assert seed.weight == 24
    assert seed.type == "S"
    assert len(seed.trans_flips) == 12
    # packing of an all-A word is 0, all-T word is all ones
    w = np.array([0], dtype=np.uint64)
    assert seed.pack(w)[0] == 0
    w = np.array([(1 << 38) - 1], dtype=np.uint64)
    assert seed.pack(w)[0] == (1 << 24) - 1


def test_seed_pack_distinguishes_match_positions():
    seed = parse_seed("1101")
    # bases: b0 b1 b2 b3, word = b0b1b2b3 2 bits each (b3 least significant)
    # kept positions: 0,1,3
    def pack_bases(bases):
        w = 0
        for b in bases:
            w = (w << 2) | b
        return seed.pack(np.array([w], dtype=np.uint64))[0]

    a = pack_bases([1, 2, 0, 3])
    b = pack_bases([1, 2, 3, 3])  # differs only at don't-care
    assert a == b
    c = pack_bases([1, 3, 0, 3])  # differs at kept position
    assert a != c


def test_transition_seed_low_bit_only():
    seed = parse_seed("1T1")
    # 'T' position keeps only the pyrimidine bit: A(0)~G(2) equal,
    # C(1)~T(3) equal, but A !~ C
    def pack_bases(bases):
        w = 0
        for b in bases:
            w = (w << 2) | b
        return seed.pack(np.array([w], dtype=np.uint64))[0]

    assert pack_bases([0, 0, 0]) == pack_bases([0, 2, 0])
    assert pack_bases([0, 1, 0]) == pack_bases([0, 3, 0])
    assert pack_bases([0, 0, 0]) != pack_bases([0, 1, 0])


def test_halfweight_seed():
    seed = parse_seed("TTT0TT")
    assert seed.is_halfweight
    assert seed.type == "H"
    assert seed.weight == 5


def test_overweight_seed():
    seed = parse_seed("1" * 12, max_index_bits=20)
    assert seed.type == "R"
    assert seed.weight == 20
    assert len(seed.resolve_bits) == 4
