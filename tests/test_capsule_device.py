"""Capsule-as-device-index (VERDICT round-1 item 8): a written
capsule loads straight to device HBM, its CSR lookups agree with the
host table, and repeated opens in one process reuse the same device
copy (the reference's build-once/mmap-share contract, capsule.c:6-15).
"""

import numpy as np

from lastz_tpu.core.encoding import UPPER_NUC_TO_BITS
from lastz_tpu.core.seeds import parse_seed
from lastz_tpu.index.capsule import (open_capsule_to_device,
                                     write_capsule_file)
from lastz_tpu.index.postable import build_seed_position_table
from lastz_tpu.io.sequence import SequenceFile


def test_capsule_device_roundtrip(tmp_path):
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    seq = alpha[rng.integers(0, 4, 30000)]
    fa = tmp_path / "t.fa"
    fa.write_text(">t\n" + bytes(seq).decode() + "\n")
    target = SequenceFile(str(fa)).load()
    seed = parse_seed("1110100110010101111", with_trans=1)
    pt = build_seed_position_table(target.v, 0, 0, UPPER_NUC_TO_BITS,
                                   seed, 1)
    cap = tmp_path / "t.capsule"
    write_capsule_file(str(cap), target, pt)

    t2, pt2, dev = open_capsule_to_device(str(cap))
    assert np.array_equal(np.asarray(dev.target_v), target.v)

    # CSR lookups on device match the host table for sampled words
    words = rng.integers(0, pt.num_words, 4096).astype(np.int64)
    host_counts = (pt.csr_start[words + 1]
                   - pt.csr_start[words]).astype(np.int64)
    dev_counts = np.asarray(
        dev.word_counts(jnp.asarray(words, jnp.int32))).astype(np.int64)
    assert np.array_equal(host_counts, dev_counts)

    # per-word position lists survive the device round trip
    w = int(words[np.argmax(host_counts)])
    lo, hi = int(pt.csr_start[w]), int(pt.csr_start[w + 1])
    assert np.array_equal(np.asarray(dev.csr_pos[lo:hi]),
                          pt.csr_pos[lo:hi])

    # memoization: a second open reuses the SAME device buffers
    t3, pt3, dev2 = open_capsule_to_device(str(cap))
    assert dev2 is dev
