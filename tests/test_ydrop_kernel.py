"""Pallas y-drop kernel vs an exact affine-DP oracle (interpret mode,
so this runs on the CPU test mesh; the real-chip path is exercised by
bench.py)."""

import numpy as np
import pytest

from lastz_tpu.core.scoring import new_dna_score_set


def exact_affine_dp(c1, c2, sub4, gap_e, gap_oe, rows, band):
    """Reference-semantics banded affine DP, no pruning.
    Col c consumes c2[c-1]; col 0 / row 0 are gap boundaries."""
    NEG = float("-inf")
    C = np.full((rows + 1, band), NEG)
    D = np.full((rows + 1, band), NEG)
    I = np.full((rows + 1, band), NEG)
    C[0, 0] = 0
    for c in range(1, band):
        if c2[c - 1] < 0:
            break
        C[0, c] = -gap_oe - (c - 1) * gap_e
    best, best_r, best_c = 0, 0, 0
    for r in range(1, rows + 1):
        if c1[r - 1] < 0:
            break
        v0 = -gap_oe - (r - 1) * gap_e
        for c in range(1, band):
            if c2[c - 1] < 0:
                break
            Dv = max(D[r - 1, c] - gap_e, C[r - 1, c] - gap_oe)
            left_c = C[r, c - 1] if c > 1 else v0
            left_i = I[r, c - 1] if c > 1 else NEG
            Iv = max(left_i - gap_e, left_c - gap_oe)
            if c > 1:
                diag = C[r - 1, c - 1]
            elif r >= 2:
                diag = -gap_oe - (r - 2) * gap_e
            else:
                diag = 0
            s = sub4[c1[r - 1], c2[c - 1]]
            Cv = max(diag + s, Dv, Iv)
            C[r, c], D[r, c], I[r, c] = Cv, Dv, Iv
            if Cv >= best:
                best, best_r, best_c = Cv, r, c
    return int(best), best_r, best_c


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_wavefront_kernel_matches_exact_dp(seed):
    import jax.numpy as jnp

    from lastz_tpu.ops.ydrop_pallas import ydrop_extend_batch

    rng = np.random.default_rng(seed)
    band, rows, B = 128, 128, 8
    ss = new_dna_score_set()
    sub4 = ss.dna4.astype(np.int32)
    base = rng.integers(0, 4, (B, max(rows, band))).astype(np.int32)
    C1 = base[:, :rows].copy()
    C2 = np.full((B, band), -1, np.int32)
    C2[:, : band - 1] = base[:, : band - 1]
    mut = rng.random(C2.shape) < 0.1
    C2[mut & (C2 >= 0)] = (C2[mut & (C2 >= 0)] + 1) % 4
    # huge y-drop: pruning inactive, kernel must equal the exact DP
    P = np.tile(np.array([30, 430, 10**7, band - 1], np.int32), (B, 1))
    out = np.asarray(ydrop_extend_batch(
        jnp.array(C1), jnp.array(C2), jnp.array(sub4), jnp.array(P),
        band=band, max_rows=rows, interpret=True))
    for i in range(B):
        best, r, c = exact_affine_dp(C1[i], C2[i], sub4, 30, 430,
                                     rows, band)
        assert int(out[i, 0]) == best, i
        # kernel reports rows in the r-1 convention
        assert int(out[i, 1]) == max(r - 1, 0), i
        assert int(out[i, 2]) == c, i
