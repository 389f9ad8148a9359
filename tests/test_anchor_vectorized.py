"""Vectorized project_matches / _prune_column_conflicts parity vs the
loop-faithful oracle (tests/oracle/refimpl_anchors.py — the r4
implementation kept verbatim).  Synthetic node alignments with multiple
blocks, reverse-oriented rows, gapped columns, and matches crossing
block boundaries on both sides."""

import numpy as np

from libmems_tpu.cga import CompactAlignment
from libmems_tpu.match import MatchArray
from libmems_tpu.progressive import (NodeAlignment,
                                     _prune_column_conflicts,
                                     project_matches)
from tests.oracle.refimpl_anchors import (project_matches_ref,
                                          prune_column_conflicts_ref)


def _rand_node_alignment(rng, leaf_ids, n_blocks=3, cols=400):
    """Blocks tile each leaf's genome left to right; every other block
    of the second row runs reverse-oriented; ~10% gap columns."""
    rows = len(leaf_ids)
    nxt = np.ones(rows, dtype=np.int64)          # next left end per row
    blocks = []
    for bi in range(n_blocks):
        bits = rng.random((rows, cols)) < 0.9
        bits[:, 0] = True
        bits[:, -1] = True
        lens = bits.sum(axis=1)
        starts = np.empty(rows, dtype=np.int64)
        for r in range(rows):
            le = nxt[r]
            rev = (r == rows - 1) and (bi % 2 == 1)
            starts[r] = -le if rev else le
            nxt[r] = le + lens[r]
        blocks.append(CompactAlignment(starts=starts, bits=bits))
    return NodeAlignment(leaf_ids=list(leaf_ids), blocks=blocks), nxt - 1


def _anchors_equal(xs, ys):
    assert len(xs) == len(ys), (len(xs), len(ys))
    for a, b in zip(xs, ys):
        for f in ("b1", "b2", "c1_lo", "c1_hi", "c2_lo", "c2_hi",
                  "forward", "length", "g1", "g2", "p1", "p2", "rel"):
            assert getattr(a, f) == getattr(b, f), (f, a, b)
        assert abs(a.score - b.score) <= 1e-9 * max(abs(b.score), 1.0)


def test_project_and_prune_parity_vs_oracle():
    rng = np.random.default_rng(17)
    aln1, ext1 = _rand_node_alignment(rng, [0, 1])
    aln2, ext2 = _rand_node_alignment(rng, [2, 3], n_blocks=4, cols=300)
    ext = {0: ext1[0], 1: ext1[1], 2: ext2[0], 3: ext2[1]}

    n = 400
    starts = np.zeros((n, 4), dtype=np.int64)
    lens = np.zeros(n, dtype=np.int64)
    for i in range(n):
        g1 = int(rng.integers(0, 2))
        g2 = int(rng.integers(2, 4))
        L = int(rng.integers(10, 250))           # crosses block borders
        p1 = int(rng.integers(1, max(ext[g1] - L, 2)))
        p2 = int(rng.integers(1, max(ext[g2] - L, 2)))
        starts[i, g1] = p1 if rng.random() < 0.5 else -p1
        starts[i, g2] = p2 if rng.random() < 0.5 else -p2
        lens[i] = L
    # a few rows the projector must skip: both leaves on one side,
    # and multiplicity-3
    starts[0, 2] = 0
    starts[0, 1] = 7
    starts[1, 0] = 11
    matches = MatchArray(starts, lens)
    scores = rng.random(n) * 100 + lens

    vec = project_matches(matches, scores, aln1, aln2)
    ref = project_matches_ref(matches, scores, aln1, aln2)
    _anchors_equal(vec, ref)
    assert len(vec) > n  # block crossings actually split

    pruned_vec = _prune_column_conflicts(aln1, aln2, vec)
    pruned_ref = prune_column_conflicts_ref(aln1, aln2, ref)
    _anchors_equal(pruned_vec, pruned_ref)
    assert 0 < len(pruned_vec) < len(vec)


def test_project_matches_empty_and_single():
    aln1, _ = _rand_node_alignment(np.random.default_rng(1), [0])
    aln2, _ = _rand_node_alignment(np.random.default_rng(2), [1])
    empty = MatchArray(np.zeros((0, 2), np.int64), np.zeros(0, np.int64))
    assert project_matches(empty, np.zeros(0), aln1, aln2) == []
    one = MatchArray(np.array([[5, -9]], np.int64),
                     np.array([30], np.int64))
    vec = project_matches(one, np.array([3.0]), aln1, aln2)
    ref = project_matches_ref(one, np.array([3.0]), aln1, aln2)
    _anchors_equal(vec, ref)
