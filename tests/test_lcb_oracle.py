"""L4 parity: array-native LCB machinery vs the loop-faithful oracle port.

The reference cannot be built here (tests/golden/README.md), so parity
at L4 (breakpoint identification, LCB partition, boundaries,
adjacencies, removal/coalescing) is property-tested against
tests/oracle/refimpl_l4.py on randomized match sets.
"""

import numpy as np
import pytest

from libmems_tpu.gbe import remove_and_coalesce
from libmems_tpu.lcb import (compute_adjacencies, compute_lcbs,
                             compute_lcb_set, identify_breakpoints)
from libmems_tpu.match import MatchArray

from tests.oracle.refimpl_l4 import (compute_adjacencies_oracle,
                                     compute_lcbs_oracle,
                                     identify_breakpoints_oracle,
                                     lcb_coverage_oracle,
                                     remove_and_coalesce_oracle)


def random_matches(rng, G, n, full=True):
    """Random match set with distinct left ends per genome (the
    reference's std::sort is unstable — ties would be ambiguous)."""
    starts = np.zeros((n, G), dtype=np.int64)
    lengths = rng.integers(10, 50, size=n).astype(np.int64)
    for g in range(G):
        le = rng.choice(np.arange(1, 100_000), size=n, replace=False)
        sign = np.where(rng.random(n) < 0.7, 1, -1)
        starts[:, g] = le * sign
    if not full:
        # drop genomes from some matches, keep multiplicity >= 2 and
        # genome 0 always present (flat-aligner full-multiplicity mode
        # aside, L4 must handle ragged participation)
        for i in range(n):
            drop = rng.random(G) < 0.25
            drop[0] = False
            if (~drop).sum() < 2:
                drop[:] = False
                drop[rng.integers(1, G)] = False
            starts[i, drop] = 0
    return MatchArray(starts, lengths)


def as_tuples(m):
    return [(tuple(int(x) for x in m.starts[i]), int(m.lengths[i]))
            for i in range(len(m))]


@pytest.mark.parametrize("seed,G,n,full", [
    (0, 2, 30, True), (1, 2, 60, True), (2, 3, 40, True),
    (3, 4, 50, True), (4, 3, 40, False), (5, 5, 80, False),
])
def test_breakpoints_and_partition_parity(seed, G, n, full):
    rng = np.random.default_rng(seed)
    m = random_matches(rng, G, n, full)
    tups = as_tuples(m)

    order_o, bps_o = identify_breakpoints_oracle(tups)
    lcbs_o = compute_lcbs_oracle(order_o, bps_o)

    order, bps = identify_breakpoints(m)
    lcbs = compute_lcbs(m, order, bps)

    part_o = sorted(tuple(l) for l in lcbs_o)
    part = sorted(tuple(int(x) for x in l) for l in lcbs)
    assert part == part_o


@pytest.mark.parametrize("seed,G,n,full", [
    (0, 2, 30, True), (2, 3, 40, True), (4, 3, 40, False),
    (6, 4, 60, False),
])
def test_adjacency_parity(seed, G, n, full):
    rng = np.random.default_rng(seed)
    m = random_matches(rng, G, n, full)
    tups = as_tuples(m)

    order_o, bps_o = identify_breakpoints_oracle(tups)
    lcbs_o = compute_lcbs_oracle(order_o, bps_o)
    adjs_o = compute_adjacencies_oracle(lcbs_o, tups)

    order, bps = identify_breakpoints(m)
    members = compute_lcbs(m, order, bps)
    lset = compute_adjacencies(m, members)

    # the partitions agree (previous test); map oracle LCB ids to ours
    # by member sets
    key_to_mine = {tuple(sorted(int(x) for x in idx)): i
                   for i, idx in enumerate(members)}
    remap = {}
    for oi, omem in enumerate(lcbs_o):
        remap[oi] = key_to_mine[tuple(sorted(omem))]

    def rl(x):
        return -1 if x == -1 else remap[x]

    # among LCBs ABSENT from a genome the reference's chain order is
    # unspecified (std::sort ties on left_end == NO_MATCH), so exact
    # link parity is only required where the LCB is present; links are
    # compared by the next PRESENT LCB along the chain in either
    # direction (absent intermediates are chain-transparent).
    def next_present_mine(i, g, right):
        adj = lset.right_adjacency if right else lset.left_adjacency
        j = int(adj[i, g])
        while j != -1 and lset.left_end[j, g] == 0:
            j = int(adj[j, g])
        return j

    def next_present_oracle(oi, g, right):
        j = (adjs_o[oi].right_adjacency[g] if right
             else adjs_o[oi].left_adjacency[g])
        while j != -1 and adjs_o[j].left_end[g] == 0:
            j = (adjs_o[j].right_adjacency[g] if right
                 else adjs_o[j].left_adjacency[g])
        return rl(j)

    for oi, ol in enumerate(adjs_o):
        mi = remap[oi]
        assert list(lset.left_end[mi]) == ol.left_end
        assert list(lset.right_end[mi]) == ol.right_end
        for g in range(len(ol.left_end)):
            if ol.left_end[g] == 0:
                continue
            assert next_present_mine(mi, g, True) \
                == next_present_oracle(oi, g, True)
            assert next_present_mine(mi, g, False) \
                == next_present_oracle(oi, g, False)
        assert lset.weight[mi] == lcb_coverage_oracle(lcbs_o[oi], tups)


@pytest.mark.parametrize("seed,G,n", [(0, 2, 40), (1, 3, 60), (2, 4, 50)])
def test_remove_and_coalesce_parity(seed, G, n):
    rng = np.random.default_rng(seed)
    m = random_matches(rng, G, n, full=True)
    tups = as_tuples(m)

    lset = compute_lcb_set(m)
    order_o, bps_o = identify_breakpoints_oracle(tups)
    lcbs_o = compute_lcbs_oracle(order_o, bps_o)
    adjs_o = compute_adjacencies_oracle(lcbs_o, tups)
    # align oracle ids with ours by member sets
    order, bps = identify_breakpoints(m)
    members = compute_lcbs(m, order, bps)
    key_to_mine = {tuple(sorted(int(x) for x in idx)): i
                   for i, idx in enumerate(members)}
    perm = [key_to_mine[tuple(sorted(om))] for om in lcbs_o]
    # reorder oracle LCBs into our id space
    inv = np.argsort(perm)
    adjs_o = [adjs_o[i] for i in inv]
    for new_id, ol in enumerate(adjs_o):
        ol.lcb_id = new_id
        for s in range(G):
            ol.left_adjacency[s] = -1 if ol.left_adjacency[s] == -1 \
                else perm[ol.left_adjacency[s]]
            ol.right_adjacency[s] = -1 if ol.right_adjacency[s] == -1 \
                else perm[ol.right_adjacency[s]]
    scores_o = [ol.weight for ol in adjs_o]

    # remove half the LCBs in random order, comparing state each step
    alive = list(range(lset.n))
    rng.shuffle(alive)
    for lcbI in alive[: lset.n // 2]:
        if lset.lcb_id[lcbI] != lcbI:
            continue
        rc, impact, remaps = remove_and_coalesce(lset, lcbI)
        rc_o, remaps_o, impact_o = remove_and_coalesce_oracle(
            adjs_o, lcbI, scores_o)
        assert rc == rc_o
        assert [(int(a), int(b)) for a, b in remaps] == \
            [(a, b if b != -1 else -1) for a, b in remaps_o]
        assert impact == impact_o
        for i, ol in enumerate(adjs_o):
            lid = -2 if ol.lcb_id == -2 else ol.lcb_id
            assert int(lset.lcb_id[i]) == lid
            assert list(lset.left_end[i]) == ol.left_end
            assert list(lset.right_end[i]) == ol.right_end
            assert [int(x) for x in lset.left_adjacency[i]] \
                == ol.left_adjacency
            assert [int(x) for x in lset.right_adjacency[i]] \
                == ol.right_adjacency
            assert np.isclose(lset.weight[i], ol.weight)
