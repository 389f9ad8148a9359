"""LCB formation, overlap elimination, and greedy breakpoint elimination."""

import numpy as np

from libmems_tpu import seeds as seedlib
from libmems_tpu.gbe import eliminate_below_weight, surviving_members
from libmems_tpu.lcb import (compute_lcb_set, compute_lcbs,
                             eliminate_overlaps, identify_breakpoints)
from libmems_tpu.match import MatchArray
from libmems_tpu.matchfind import find_mums

ALPHA = np.array(list("ACGT"))


def rc(s):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    return "".join(comp[c] for c in reversed(s))


def random_seq(rng, n):
    return "".join(rng.choice(ALPHA, size=n))


def mutate(rng, s, rate):
    chars = np.array(list(s))
    idx = rng.random(len(chars)) < rate
    chars[idx] = rng.choice(ALPHA, size=idx.sum())
    return "".join(chars)


def ma(rows):
    starts = np.array([r[:-1] for r in rows], dtype=np.int64)
    lens = np.array([r[-1] for r in rows], dtype=np.int64)
    return MatchArray(starts, lens)


# ----------------------------------------------------------------------
# identify_breakpoints / compute_lcbs
# ----------------------------------------------------------------------

def test_collinear_single_lcb():
    m = ma([(1, 1, 10), (20, 22, 10), (40, 41, 10)])
    order, bps = identify_breakpoints(m)
    assert len(bps) == 1
    lcbs = compute_lcbs(m, order, bps)
    assert len(lcbs) == 1 and len(lcbs[0]) == 3


def test_transposition_two_lcbs():
    # genome 2 swaps the order of two collinear groups
    m = ma([(1, 100, 10), (20, 120, 10), (60, 10, 10), (80, 30, 10)])
    order, bps = identify_breakpoints(m)
    lcbs = compute_lcbs(m, order, bps)
    assert len(lcbs) == 2
    sizes = sorted(len(l) for l in lcbs)
    assert sizes == [2, 2]


def test_inversion_three_lcbs():
    # middle block inverted in genome 2
    m = ma([(1, 1, 10), (30, -60, 10), (45, -45, 10), (90, 90, 10)])
    order, bps = identify_breakpoints(m)
    lcbs = compute_lcbs(m, order, bps)
    assert len(lcbs) == 3
    # the inverted pair stays together: matches at |starts| 30,45 in g1
    mid = [l for l in lcbs if len(l) == 2]
    assert len(mid) == 1


def test_single_match():
    m = ma([(5, 7, 12)])
    order, bps = identify_breakpoints(m)
    assert len(compute_lcbs(m, order, bps)) == 1


# ----------------------------------------------------------------------
# eliminate_overlaps
# ----------------------------------------------------------------------

def _no_overlaps(m: MatchArray) -> bool:
    for g in range(m.seq_count):
        s = np.abs(m.starts[:, g])
        keep = s != 0
        le = s[keep]
        re = le + m.lengths[keep] - 1
        order = np.argsort(le)
        le, re = le[order], re[order]
        if (le[1:] <= re[:-1]).any():
            return False
    return True


def test_eliminate_overlaps_basic():
    # two matches overlapping by 5 in genome 0 only
    m = ma([(1, 1, 20), (16, 100, 20)])
    out = eliminate_overlaps(m)
    assert _no_overlaps(out)
    # total multiplicity-2 coverage in genome 0 is preserved minus overlap
    assert out.lengths.sum() >= 30


def test_eliminate_overlaps_containment():
    # second match entirely inside the first in genome 0
    m = ma([(1, 1, 50), (10, 100, 10)])
    out = eliminate_overlaps(m)
    assert _no_overlaps(out)


def test_eliminate_overlaps_noop():
    m = ma([(1, 1, 10), (50, 50, 10)])
    out = eliminate_overlaps(m)
    assert out.key_set() == m.key_set()


# ----------------------------------------------------------------------
# GBE
# ----------------------------------------------------------------------

def test_gbe_removes_weak_and_coalesces():
    # A (cols 1-30), junk B inverted (cols 50-52), C (cols 70-100):
    # removing B makes A and C adjacent and collinear -> coalesce
    m = ma([(1, 1, 30), (50, -50, 3), (70, 70, 30)])
    lcbs = compute_lcb_set(m)
    assert lcbs.n == 3
    eliminate_below_weight(lcbs, 20.0)
    surv = surviving_members(lcbs)
    assert len(surv) == 1
    assert sorted(np.concatenate(surv).tolist()) == [0, 2]


def test_gbe_keeps_heavy_blocks():
    m = ma([(1, 100, 30), (50, 1, 30)])  # transposed, both heavy
    lcbs = compute_lcb_set(m)
    eliminate_below_weight(lcbs, 20.0)
    assert len(surviving_members(lcbs)) == 2


def test_gbe_weight_floor():
    m = ma([(1, 100, 5), (50, 1, 30)])
    lcbs = compute_lcb_set(m)
    eliminate_below_weight(lcbs, 20.0)  # weight of first = 10 < 20
    surv = surviving_members(lcbs)
    assert len(surv) == 1
    assert surv[0].tolist() == [1]


# ----------------------------------------------------------------------
# end-to-end on synthetic sequences
# ----------------------------------------------------------------------

def test_lcbs_on_found_mums():
    rng = np.random.default_rng(11)
    blocks = [random_seq(rng, 200) for _ in range(3)]
    a = "".join(blocks)
    b = mutate(rng, blocks[0], 0.02) + rc(mutate(rng, blocks[2], 0.02)) \
        + mutate(rng, blocks[1], 0.02)
    seed = seedlib.get_seed(9, 0)
    mums = find_mums([a, b], seed)
    mums = eliminate_overlaps(mums).multiplicity_filter(2)
    lcbs = compute_lcb_set(mums)
    eliminate_below_weight(lcbs, 50.0)
    surv = surviving_members(lcbs)
    # three rearranged blocks -> three LCBs
    assert len(surv) == 3
