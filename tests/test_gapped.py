"""Batched Gotoh DP vs an O(mn) loop oracle + traceback consistency."""

import numpy as np
import pytest

from libmems_tpu.ops.gapped import (GAP_EXTEND, GAP_OPEN, HOXD70,
                                    align_pairs, align_score)

NEG = -(1 << 30)


def gotoh_oracle(a, b, go=GAP_OPEN, ge=GAP_EXTEND):
    M, N = len(a), len(b)
    H = np.full((M + 1, N + 1), NEG, dtype=np.int64)
    E = np.full((M + 1, N + 1), NEG, dtype=np.int64)
    F = np.full((M + 1, N + 1), NEG, dtype=np.int64)
    H[0, 0] = 0
    for j in range(1, N + 1):
        E[0, j] = go + ge * j
        H[0, j] = E[0, j]
    for i in range(1, M + 1):
        F[i, 0] = go + ge * i
        H[i, 0] = F[i, 0]
    for i in range(1, M + 1):
        for j in range(1, N + 1):
            E[i, j] = max(H[i, j - 1] + go + ge, E[i, j - 1] + ge)
            F[i, j] = max(H[i - 1, j] + go + ge, F[i - 1, j] + ge)
            H[i, j] = max(H[i - 1, j - 1] + HOXD70[a[i - 1], b[j - 1]],
                          E[i, j], F[i, j])
    return int(H[M, N])


def alignment_score(a, b, a_gaps, b_gaps, go=GAP_OPEN, ge=GAP_EXTEND):
    """Score an alignment given per-row gap masks (affine)."""
    score = 0
    ai = bi = 0
    prev_a_gap = prev_b_gap = False
    for col in range(len(a_gaps)):
        ag, bg = bool(a_gaps[col]), bool(b_gaps[col])
        assert not (ag and bg)
        if ag:
            score += ge + (0 if prev_a_gap else go)
            bi += 1
        elif bg:
            score += ge + (0 if prev_b_gap else go)
            ai += 1
        else:
            score += HOXD70[a[ai], b[bi]]
            ai += 1
            bi += 1
        prev_a_gap, prev_b_gap = ag, bg
    assert ai == len(a) and bi == len(b)
    return int(score)


@pytest.mark.parametrize("seed,la,lb", [(0, 20, 20), (1, 35, 28),
                                        (2, 10, 40), (3, 57, 60),
                                        (4, 1, 30), (5, 30, 1)])
def test_score_matches_oracle(seed, la, lb):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 4, la).astype(np.uint8)
    b = rng.integers(0, 4, lb).astype(np.uint8)
    assert align_score(a, b) == gotoh_oracle(a, b)


def test_identical_sequences():
    rng = np.random.default_rng(9)
    a = rng.integers(0, 4, 50).astype(np.uint8)
    expected = sum(int(HOXD70[c, c]) for c in a)
    assert align_score(a, a) == expected


def test_traceback_reaches_dp_score():
    rng = np.random.default_rng(10)
    pairs = []
    for _ in range(12):
        la = int(rng.integers(5, 60))
        lb = int(rng.integers(5, 60))
        a = rng.integers(0, 4, la).astype(np.uint8)
        b = a[:lb].copy() if rng.random() < 0.5 else \
            rng.integers(0, 4, lb).astype(np.uint8)
        pairs.append((a, b))
    masks = align_pairs(pairs)
    for (a, b), (ag, bg) in zip(pairs, masks):
        got = alignment_score(a, b, ag, bg)
        want = gotoh_oracle(a, b)
        assert got == want, (len(a), len(b), got, want)


def test_related_sequences_align_mostly_gapless():
    rng = np.random.default_rng(11)
    a = rng.integers(0, 4, 200).astype(np.uint8)
    b = a.copy()
    b[50] = (b[50] + 1) % 4  # one substitution
    (ag, bg), = align_pairs([(a, b)])
    assert ag.sum() == 0 and bg.sum() == 0  # no gaps needed


def test_indel_alignment():
    rng = np.random.default_rng(12)
    a = rng.integers(0, 4, 120).astype(np.uint8)
    b = np.concatenate([a[:60], a[70:]])  # 10-base deletion in b
    (ag, bg), = align_pairs([(a, b)])
    # one gap run of length 10 in b's row
    assert bg.sum() == 10
    assert ag.sum() == 0


def test_read_substitution_matrix():
    import io
    from libmems_tpu.ops.gapped import read_substitution_matrix
    txt = ("#example matrix\n"
           "A C G T N\n"
           "A 91 -114 -31 -123 0\n"
           "C -114 100 -125 -31 0\n"
           "G -31 -125 100 -114 0\n"
           "T -123 -31 -114 91 0\n")
    m = read_substitution_matrix(io.StringIO(txt))
    assert (m == HOXD70).all()
    bad = txt.replace("A C G T N", "A C G T")
    try:
        read_substitution_matrix(io.StringIO(bad))
        assert False, "should reject bad header"
    except (ValueError, IndexError):
        pass
