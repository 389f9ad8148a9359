"""Guide tree: Newick round-trip, NJ correctness, midpoint rooting,
distance matrices (reference: libMems/PhyloTree.h, DistanceMatrix.h,
MuscleInterface::CreateTree)."""

import numpy as np
import pytest

from libmems_tpu.distance import (distance_matrix, identity_matrix,
                                  single_copy_distance)
from libmems_tpu.match import MatchArray
from libmems_tpu.tree import (TreeNode, alignment_order, assign_sequence_ids,
                              midpoint_root, neighbor_joining, parse_newick,
                              write_newick)


def tree_dists(root):
    """Pairwise leaf distances from a tree."""
    leaves = root.leaves()
    out = {}
    paths = {}
    for leaf in leaves:
        p, node = [], leaf
        while node is not None:
            p.append(node)
            node = node.parent
        paths[leaf.name] = p[::-1]
    for i, a in enumerate(leaves):
        for b in leaves[i + 1:]:
            pa, pb = paths[a.name], paths[b.name]
            k = 0
            while k < len(pa) and k < len(pb) and pa[k] is pb[k]:
                k += 1
            key = tuple(sorted((a.name, b.name)))
            out[key] = sum(x.distance for x in pa[k:]) + \
                sum(x.distance for x in pb[k:])
    return out


def test_newick_roundtrip():
    s = "((A:0.1,B:0.2):0.05,(C:0.3,D:0.4):0.06,E:0.5);"
    t = parse_newick(s)
    assert sorted(l.name for l in t.leaves()) == ["A", "B", "C", "D", "E"]
    s2 = write_newick(t)
    t2 = parse_newick(s2)
    assert tree_dists(t) == tree_dists(t2)


def test_newick_no_distance():
    t = parse_newick("(A,(B,C));")
    assert sorted(l.name for l in t.leaves()) == ["A", "B", "C"]
    assert t.children[0].distance == 0.0


def test_nj_recovers_additive_tree():
    # additive matrix from a known tree:
    # ((A:2,B:3):1,(C:4,D:5):2); pairwise path lengths
    D = np.array([
        [0, 5, 7, 8],
        [5, 0, 8, 9],
        [7, 8, 0, 9],
        [8, 9, 0, 0],
    ], dtype=float)
    D[3, 2] = 9
    D[2, 3] = 9
    t = neighbor_joining(D, names=list("ABCD"))
    d = tree_dists(t)
    for (a, b), v in d.items():
        i, j = "ABCD".index(a), "ABCD".index(b)
        assert abs(v - D[i, j]) < 1e-9, (a, b, v, D[i, j])


def test_nj_leaf_ids():
    D = np.array([[0, 1, 2], [1, 0, 3], [2, 3, 0]], dtype=float)
    t = neighbor_joining(D)
    ids = sorted(l.sequence_id for l in t.leaves())
    assert ids == [0, 1, 2]
    names = sorted(l.name for l in t.leaves())
    assert names == ["seq1", "seq2", "seq3"]
    assign_sequence_ids(t)  # seqN convention re-parse must agree
    assert sorted(l.sequence_id for l in t.leaves()) == [0, 1, 2]


def test_midpoint_root_balances_diameter():
    # unbalanced caterpillar: diameter path A..D length 10
    t = parse_newick("(((A:1,B:1):1,C:1):1,D:7);")
    r = midpoint_root(t)
    d = tree_dists(r)
    # diameter pair distances are preserved
    assert abs(d[("A", "D")] - 10) < 1e-9
    # root must split the A-D path 5/5: depth of A == depth of D == 5
    depths = {}
    for leaf in r.leaves():
        acc, node = 0.0, leaf
        while node.parent is not None:
            acc += node.distance
            node = node.parent
        depths[leaf.name] = acc
    assert abs(depths["A"] - 5) < 1e-9
    assert abs(depths["D"] - 5) < 1e-9


def test_midpoint_root_preserves_distances():
    rng = np.random.default_rng(0)
    pts = rng.random((6, 4))
    D = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
    t = neighbor_joining(D, names=[f"L{i}" for i in range(6)])
    before = tree_dists(t)
    r = midpoint_root(t)
    after = tree_dists(r)
    for k, v in before.items():
        assert abs(after[k] - v) < 1e-9


def test_alignment_order_postorder():
    t = parse_newick("((A,B),(C,D));")
    order = alignment_order(t)
    assert len(order) == 3
    assert order[-1] is t  # root aligned last


def test_identity_and_distance_matrix():
    # two matches: both genomes (len 10), genome pair (0,1) only (len 5)
    starts = np.array([[1, 1, 1], [20, 20, 0]], dtype=np.int64)
    lengths = np.array([10, 5], dtype=np.int64)
    m = MatchArray(starts, lengths)
    ident = identity_matrix(m, [100, 100, 200])
    assert abs(ident[0, 1] - 15 / 100) < 1e-12
    assert abs(ident[0, 2] - 10 / 100) < 1e-12
    assert abs(ident[1, 2] - 10 / 100) < 1e-12
    dist = distance_matrix(m, [100, 100, 200])
    assert abs(dist[0, 1] - (1 - 0.15)) < 1e-12


def test_single_copy_distance_interval_union():
    # overlapping matches must not double-count coverage
    starts = np.array([[1, 1], [6, 6]], dtype=np.int64)
    lengths = np.array([10, 10], dtype=np.int64)
    m = MatchArray(starts, lengths)
    d = single_copy_distance(m, [20, 40])
    # genome0 covered 15/20, genome1 covered 15/40
    expect = 1 - (15 / 20 + 15 / 40) / 2
    assert abs(d[0, 1] - expect) < 1e-12
    assert d[0, 0] == 0.0


def test_nj_two_leaves():
    D = np.array([[0, 4], [4, 0]], dtype=float)
    t = neighbor_joining(D)
    d = tree_dists(t)
    assert abs(d[("seq1", "seq2")] - 4) < 1e-9
