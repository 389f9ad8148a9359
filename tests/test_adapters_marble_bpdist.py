"""Match projection adapters, Interval::Marble, pairwise BP distance."""

import numpy as np

from libmems_tpu.distance import (breakpoint_distance_matrix,
                                  default_bp_dist_estimate_min_score,
                                  default_breakpoint_max)
from libmems_tpu.interval import (Block, Interval, interval_from_matches,
                                  marble)
from libmems_tpu.match import MatchArray
from libmems_tpu.sequence import Genome

ALPHA = np.array(list("ACGT"))


def ma(rows):
    starts = np.array([r[:-1] for r in rows], dtype=np.int64)
    lens = np.array([r[-1] for r in rows], dtype=np.int64)
    return MatchArray(starts, lens)


# ---------------------------------------------------------------- project

def test_project_pairwise_keeps_shared_matches():
    m = ma([
        (10, 20, 30, 5),     # all three genomes
        (40, 0, 50, 6),      # genomes 0,2 only
        (0, 60, 70, 7),      # genomes 1,2 only
    ])
    p = m.project([0, 1])
    assert p.n_matches == 1
    assert p.starts.tolist() == [[10, 20]]
    p02 = m.project([0, 2])
    assert p02.n_matches == 2
    assert p02.starts.tolist() == [[10, 30], [40, 50]]


def test_project_normalizes_leading_strand():
    m = ma([(-10, 20, 5), (-30, -40, 6)])
    p = m.project([0, 1])
    # leading genome flipped to forward; partner sign flips with it
    assert p.starts.tolist() == [[10, -20], [30, 40]]
    raw = m.project([0, 1], normalize=False)
    assert raw.starts.tolist() == [[-10, 20], [-30, -40]]


def test_project_min_multiplicity_one_keeps_all():
    m = ma([(40, 0, 50, 6)])
    p = m.project([0, 1], min_multiplicity=1)
    assert p.n_matches == 1
    assert p.starts.tolist() == [[40, 0]]


# ----------------------------------------------------------------- marble

def _gap_block(G, g, start, length):
    gs = np.zeros(G, dtype=np.int64)
    gl = np.zeros(G, dtype=np.int64)
    gs[g] = start
    gl[g] = length
    return Block(gs, gl)


def test_marble_splits_long_gaps():
    # anchor, 120-col gap in genome 0, 35-col gap in genome 1, anchor
    anchor1 = Block(np.array([1, 1], np.int64), np.array([8, 8], np.int64))
    anchor2 = Block(np.array([129, 44], np.int64),
                    np.array([8, 8], np.int64))
    iv = Interval(blocks=[anchor1, _gap_block(2, 0, 9, 120),
                          _gap_block(2, 1, 9, 35), anchor2], seq_count=2)
    mv = marble(iv, 50)
    # gap pieces all <= 50 columns
    for b in mv.blocks:
        present = b.starts != 0
        if b.rows is None and int(present.sum()) == 1:
            assert int(b.lengths.max()) <= 50
    # total genome coverage per genome preserved
    assert np.array_equal(mv.left_ends(), iv.left_ends())
    assert np.array_equal(mv.right_ends(), iv.right_ends())
    # anchors still first and last
    assert np.array_equal(mv.blocks[0].starts, anchor1.starts)
    assert np.array_equal(mv.blocks[-1].starts, anchor2.starts)
    # columns conserved up to reordering
    assert mv.alignment_length == iv.alignment_length


def test_marble_reverse_gap_pieces_cover_range():
    # reverse-strand gap: left end 9, length 100, read right-to-left
    iv = Interval(blocks=[_gap_block(2, 0, -9, 100)], seq_count=2)
    mv = marble(iv, 30)
    lens = [int(b.lengths.max()) for b in mv.blocks]
    assert all(ln <= 30 for ln in lens)
    assert sum(lens) == 100
    # pieces are reverse-strand and tile [9, 108] without overlap
    spans = sorted((abs(int(b.starts[0])),
                    abs(int(b.starts[0])) + int(b.lengths[0]))
                   for b in mv.blocks)
    assert spans[0][0] == 9 and spans[-1][1] == 109
    for (l0, h0), (l1, h1) in zip(spans, spans[1:]):
        assert h0 == l1
    assert all(int(b.starts[0]) < 0 for b in mv.blocks)
    # column order is right-to-left: first block holds highest coords
    firsts = [abs(int(b.starts[0])) for b in mv.blocks]
    assert firsts == sorted(firsts, reverse=True)


def test_marble_renders_same_sequence_content():
    rng = np.random.default_rng(3)
    a = Genome.from_string("".join(rng.choice(ALPHA, 200)), name="a")
    b = Genome.from_string("".join(rng.choice(ALPHA, 200)), name="b")
    m = ma([(1, 1, 10), (150, 150, 10)])
    iv = interval_from_matches(m, np.array([0, 1]))
    mv = marble(iv, 25)
    for g, genome in enumerate([a, b]):
        before = iv.render([a, b])[g].tobytes().replace(b"-", b"")
        after = mv.render([a, b])[g].tobytes().replace(b"-", b"")
        assert before == after


# ----------------------------------------------------- bp distance matrix

def _mutate(rng, s, rate):
    chars = np.array(list(s))
    idx = rng.random(len(chars)) < rate
    chars[idx] = rng.choice(ALPHA, size=int(idx.sum()))
    return "".join(chars)


def test_breakpoint_distance_orders_rearrangement():
    rng = np.random.default_rng(7)
    base = "".join(rng.choice(ALPHA, 3000))
    g0 = Genome.from_string(base, name="g0")
    g1 = Genome.from_string(_mutate(rng, base, 0.01), name="g1")
    # genome 2 = an inversion of the middle third (one rearrangement)
    seg = base[1000:2000]
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    inv = "".join(comp[c] for c in reversed(seg))
    g2 = Genome.from_string(base[:1000] + inv + base[2000:], name="g2")

    from libmems_tpu.matchfind import find_mums
    from libmems_tpu import seeds as seedlib
    mums = find_mums([g0, g1, g2], seed=seedlib.get_seed(9, 0))
    d = breakpoint_distance_matrix(
        mums, [g0, g1, g2], min_penalty=100.0, bp_dist_estimate=300.0)
    assert d.shape == (3, 3)
    assert np.allclose(d, d.T)
    # the rearranged pair is farther than the collinear pair
    assert d[0, 2] > d[0, 1]
    assert d.max() <= 0.9 + 1e-9


def test_bp_distance_defaults():
    assert default_bp_dist_estimate_min_score([2 ** 20]) == \
        3.0 * 20.0 * 7000.0
    assert default_breakpoint_max([2_000_000]) == 30.0
