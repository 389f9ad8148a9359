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


def _naive_eliminate_overlaps(matches: MatchArray) -> MatchArray:
    """Unclustered reference sweep (Aligner.cpp:62-178 loop-faithful):
    full per-genome sort + sequential trim over the whole list.  Used
    only as the parity oracle for the clustered production version."""
    from libmems_tpu.lcb import _crop_start, _crop_end
    from libmems_tpu.match import NO_MATCH
    if len(matches) < 2:
        return matches
    seq_count = matches.seq_count
    work = [[matches.starts[i].astype(np.int64).copy(),
             int(matches.lengths[i])] for i in range(len(matches))]
    for seqI in range(seq_count):
        work = [m for m in work if m is not None]
        work.sort(key=lambda m: (m[0][seqI] != NO_MATCH, abs(m[0][seqI])))
        new_matches = []
        matchI = 0
        while matchI < len(work) and work[matchI][0][seqI] == NO_MATCH:
            matchI += 1
        while matchI < len(work):
            if work[matchI] is None:
                matchI += 1
                continue
            nextI = matchI + 1
            deleted_matchI = False
            while nextI < len(work):
                if work[nextI] is None:
                    nextI += 1
                    continue
                startI = int(work[matchI][0][seqI])
                lenI = work[matchI][1]
                startJ = int(work[nextI][0][seqI])
                diff = abs(startJ) - abs(startI) - lenI
                if diff >= 0:
                    break
                diff = -diff
                multI = int((work[matchI][0] != NO_MATCH).sum())
                multJ = int((work[nextI][0] != NO_MATCH).sum())
                lenJ = work[nextI][1]
                if (multJ > multI) or (multJ == multI and lenJ > lenI):
                    new_s, new_l = work[matchI][0].copy(), lenI
                    if diff >= lenI:
                        work[matchI] = None
                        deleted_matchI = True
                    else:
                        if startI > 0:
                            work[matchI][0], work[matchI][1] = _crop_end(
                                work[matchI][0], lenI, diff)
                            new_s, new_l = _crop_start(new_s, new_l,
                                                       new_l - diff)
                        else:
                            work[matchI][0], work[matchI][1] = _crop_start(
                                work[matchI][0], lenI, diff)
                            new_s, new_l = _crop_end(new_s, new_l,
                                                     new_l - diff)
                else:
                    new_s, new_l = work[nextI][0].copy(), lenJ
                    if diff >= lenJ:
                        work[nextI] = None
                    else:
                        if startJ > 0:
                            work[nextI][0], work[nextI][1] = _crop_start(
                                work[nextI][0], lenJ, diff)
                            new_s, new_l = _crop_end(new_s, new_l,
                                                     new_l - diff)
                        else:
                            work[nextI][0], work[nextI][1] = _crop_end(
                                work[nextI][0], lenJ, diff)
                            new_s, new_l = _crop_start(new_s, new_l,
                                                      new_l - diff)
                new_s[seqI] = NO_MATCH
                if new_l > 0 and (new_s != NO_MATCH).sum() > 1:
                    new_matches.append([new_s, new_l])
                if deleted_matchI:
                    break
                nextI += 1
            matchI += 1
        work = [m for m in work if m is not None] + new_matches
    if not work:
        return MatchArray.empty(seq_count)
    return MatchArray(np.stack([m[0] for m in work]),
                      np.array([m[1] for m in work], dtype=np.int64))


def test_eliminate_overlaps_clustered_parity_random():
    """The clustered fast path must be row-identical to the unclustered
    reference sweep on dense random overlap sets."""
    rng = np.random.default_rng(7)
    for trial in range(60):
        G = int(rng.integers(2, 5))
        N = int(rng.integers(2, 40))
        starts = np.zeros((N, G), dtype=np.int64)
        lengths = rng.integers(5, 60, size=N).astype(np.int64)
        for i in range(N):
            nz = rng.random(G) < 0.8
            if nz.sum() < 2:
                nz[:] = True
            pos = rng.integers(1, 300, size=G)
            sgn = rng.choice([-1, 1], size=G)
            starts[i] = np.where(nz, sgn * pos, 0)
        a = _naive_eliminate_overlaps(
            MatchArray(starts.copy(), lengths.copy()))
        b = eliminate_overlaps(MatchArray(starts.copy(), lengths.copy()))
        assert np.array_equal(a.starts, b.starts)
        assert np.array_equal(a.lengths, b.lengths)


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
