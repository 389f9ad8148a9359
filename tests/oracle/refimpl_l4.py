"""Loop-faithful oracle port of the reference's L4 LCB machinery.

INTENTIONAL PORT — test infrastructure only, never shipped in the
package.  Like tests/oracle/refimpl.py (L2/L3), this re-states the
reference's L4 algorithms line by line so the array-native
implementations in libmems_tpu.lcb / libmems_tpu.gbe can be
property-tested for bit-parity.  The real reference cannot be built in
this environment (no boost, no libGenome, no libMUSCLE, no autotools,
no network — see tests/golden/README.md), so these ports stand in for
golden files at L4.

Sources:
* IdentifyBreakpoints        — GreedyBreakpointElimination.h:161-226
* ComputeLCBs_v2             — GreedyBreakpointElimination.h:229-248
* FindBoundaries             — Interval.h:704-760
* computeLCBAdjacencies_v3   — GreedyBreakpointElimination.h:251-311
* GetLCBCoverage             — Aligner.cpp:599-625 (N-free inputs)
* RemoveLCBandCoalesce       — GreedyBreakpointElimination.cpp:147-271

Matches are (starts, length) pairs with signed 1-based starts exactly
like libmems_tpu.match.MatchArray rows.
"""

from __future__ import annotations

NO_MATCH = 0
UNASSIGNED = -1


def _left_end(starts, seq):
    s = starts[seq]
    return abs(s)


def _orientation(starts, seq):
    """True = forward (AbstractMatch::forward)."""
    return starts[seq] > 0


def _ssc_less(a_starts, b_starts, seq):
    """SSC comparator: undefined < defined, else LeftEnd order
    (AbstractMatch.h:375-385)."""
    a = _left_end(a_starts, seq)
    b = _left_end(b_starts, seq)
    if a == NO_MATCH or b == NO_MATCH:
        return b != NO_MATCH
    return a < b


def identify_breakpoints_oracle(matches):
    """matches: list of (starts tuple, length).  Returns (order,
    breakpoints) where order is the genome-0 sort and breakpoints are
    indices into it (IdentifyBreakpoints, GBE.h:161-226)."""
    n = len(matches)
    if n == 0:
        return [], []
    import functools
    order = sorted(range(n), key=functools.cmp_to_key(
        lambda i, j: -1 if _ssc_less(matches[i][0], matches[j][0], 0)
        else (1 if _ssc_less(matches[j][0], matches[i][0], 0) else 0)))
    mlist = [matches[i] for i in order]
    breakpoints = {n - 1}
    seq_count = len(mlist[0][0])
    label_list = list(range(n))  # label = index in genome-0 order
    for seqI in range(1, seq_count):
        labels = sorted(label_list, key=functools.cmp_to_key(
            lambda i, j: -1 if _ssc_less(mlist[i][0], mlist[j][0], seqI)
            else (1 if _ssc_less(mlist[j][0], mlist[i][0], seqI) else 0)))
        prev = 0
        prev_orient = (_orientation(mlist[labels[0]][0], seqI)
                       == _orientation(mlist[labels[0]][0], 0))
        if not prev_orient:
            breakpoints.add(labels[0])
        for it in range(1, n):
            cur_orient = (_orientation(mlist[labels[it]][0], seqI)
                          == _orientation(mlist[labels[it]][0], 0))
            if prev_orient == cur_orient and (
                    (prev_orient and labels[prev] + 1 == labels[it]) or
                    (not prev_orient and labels[prev] - 1 == labels[it])):
                prev_orient = cur_orient
                prev = it
                continue
            if prev_orient:
                breakpoints.add(labels[prev])
            if not cur_orient:
                breakpoints.add(labels[it])
            prev_orient = cur_orient
            prev = it
        if prev_orient:
            breakpoints.add(labels[prev])
    return order, sorted(breakpoints)


def compute_lcbs_oracle(order, breakpoints):
    """Partition genome-0-ordered match indices at breakpoints
    (ComputeLCBs_v2, GBE.h:229-248)."""
    lcbs = []
    prev = 0
    for bp in breakpoints:
        lcbs.append(order[prev:bp + 1])
        prev = bp + 1
    return lcbs


def find_boundaries_oracle(matches):
    """(left_ends, lengths, orientations) per genome
    (FindBoundaries, Interval.h:704-760)."""
    seq_count = len(matches[0][0])
    left_ends = [NO_MATCH] * seq_count
    lengths = [0] * seq_count
    orientations = [False] * seq_count

    for starts, L in matches:                    # forward left ends
        zero_exists = False
        for s in range(seq_count):
            if left_ends[s] == NO_MATCH and _orientation(starts, s):
                left_ends[s] = _left_end(starts, s)
                orientations[s] = True
            elif left_ends[s] == NO_MATCH:
                zero_exists = True
        if not zero_exists:
            break
    for starts, L in reversed(matches):          # forward extents
        zero_exists = False
        for s in range(seq_count):
            if lengths[s] == 0 and _orientation(starts, s):
                lengths[s] = _left_end(starts, s) + L - left_ends[s]
            if left_ends[s] != NO_MATCH and lengths[s] == 0:
                zero_exists = True
        if not zero_exists:
            break
    for starts, L in reversed(matches):          # reverse left ends
        zero_exists = False
        for s in range(seq_count):
            if left_ends[s] == NO_MATCH and starts[s] != NO_MATCH \
                    and not _orientation(starts, s):
                left_ends[s] = _left_end(starts, s)
            if left_ends[s] == NO_MATCH:
                zero_exists = True
        if not zero_exists:
            break
    for starts, L in matches:                    # reverse extents
        zero_exists = False
        for s in range(seq_count):
            if starts[s] != NO_MATCH and not _orientation(starts, s) \
                    and lengths[s] == 0:
                lengths[s] = L + (_left_end(starts, s) - left_ends[s])
            if lengths[s] == 0:
                zero_exists = True
        if not zero_exists:
            break
    return left_ends, lengths, orientations


class OracleLCB:
    __slots__ = ("left_end", "right_end", "left_adjacency",
                 "right_adjacency", "lcb_id", "weight", "to_be_deleted")

    def __init__(self, seq_count):
        self.left_end = [0] * seq_count
        self.right_end = [0] * seq_count
        self.left_adjacency = [UNASSIGNED] * seq_count
        self.right_adjacency = [UNASSIGNED] * seq_count
        self.lcb_id = 0
        self.weight = 0.0
        self.to_be_deleted = False


def lcb_coverage_oracle(members, matches):
    """weight = sum(length * multiplicity) (GetLCBCoverage,
    Aligner.cpp:599-625; inputs are N-free by construction)."""
    total = 0
    for mi in members:
        starts, L = matches[mi]
        mult = sum(1 for s in starts if s != NO_MATCH)
        total += L * mult
    return float(total)


def compute_adjacencies_oracle(lcb_members, matches, weights=None):
    """computeLCBAdjacencies_v3 (GBE.h:251-311)."""
    n = len(lcb_members)
    if n == 0:
        return []
    seq_count = len(matches[0][0])
    adjacencies = []
    for lcbI, members in enumerate(lcb_members):
        mlist = [matches[i] for i in members]
        left_ends, lengths, orients = find_boundaries_oracle(mlist)
        lcb = OracleLCB(seq_count)
        for s in range(seq_count):
            if left_ends[s] == NO_MATCH:
                continue
            lcb.left_end[s] = left_ends[s]
            lcb.right_end[s] = left_ends[s] + lengths[s]
            if not orients[s]:
                lcb.left_end[s] = -lcb.left_end[s]
                lcb.right_end[s] = -lcb.right_end[s]
        lcb.lcb_id = lcbI
        lcb.weight = (weights[lcbI] if weights is not None
                      else lcb_coverage_oracle(members, matches))
        adjacencies.append(lcb)

    import functools

    def llc_less(a, b, seq):
        """LCBLeftComparator (LCB.h:32-52)."""
        x, y = a.left_end[seq], b.left_end[seq]
        if x == NO_MATCH or y == NO_MATCH:
            return y != NO_MATCH
        return abs(x) < abs(y)

    for s in range(seq_count):
        adjacencies.sort(key=functools.cmp_to_key(
            lambda a, b, s=s: -1 if llc_less(a, b, s)
            else (1 if llc_less(b, a, s) else 0)))
        for i in range(1, n - 1):
            adjacencies[i].left_adjacency[s] = adjacencies[i - 1].lcb_id
            adjacencies[i].right_adjacency[s] = adjacencies[i + 1].lcb_id
        last = n - 1
        adjacencies[0].left_adjacency[s] = UNASSIGNED
        adjacencies[last].right_adjacency[s] = UNASSIGNED
        if last > 0:
            adjacencies[0].right_adjacency[s] = adjacencies[1].lcb_id
            adjacencies[last].left_adjacency[s] = \
                adjacencies[last - 1].lcb_id
    adjacencies.sort(key=lambda l: l.lcb_id)
    return adjacencies


def remove_and_coalesce_oracle(adjacencies, lcbI, scores):
    """RemoveLCBandCoalesce (GBE.cpp:147-271).  Mutates `adjacencies`
    and `scores`; returns (removed_count, id_remaps, impact_list)."""
    seq_count = len(adjacencies[lcbI].left_end)
    removed_count = 0
    impact = []
    id_remaps = []
    adjacencies[lcbI].lcb_id = -2

    for s in range(seq_count):
        la = adjacencies[lcbI].left_adjacency[s]
        ra = adjacencies[lcbI].right_adjacency[s]
        if la != UNASSIGNED:
            adjacencies[la].right_adjacency[s] = ra
        if ra != UNASSIGNED and ra != len(adjacencies):
            adjacencies[ra].left_adjacency[s] = la

    for s in range(seq_count):
        la = adjacencies[lcbI].left_adjacency[s]
        ra = adjacencies[lcbI].right_adjacency[s]
        impact.append(la)
        impact.append(ra)
        for s2 in range(seq_count):
            if la != UNASSIGNED:
                impact.append(adjacencies[la].left_adjacency[s2])
                impact.append(adjacencies[la].right_adjacency[s2])
            if ra != UNASSIGNED:
                impact.append(adjacencies[ra].left_adjacency[s2])
                impact.append(adjacencies[ra].right_adjacency[s2])

    id_remaps.append((lcbI, -1))
    removed_count += 1

    for s in range(seq_count):
        la = adjacencies[lcbI].left_adjacency[s]
        ra = adjacencies[lcbI].right_adjacency[s]
        while la != UNASSIGNED and adjacencies[la].lcb_id != la:
            la = adjacencies[la].left_adjacency[s]
        while ra != UNASSIGNED and adjacencies[ra].lcb_id != ra:
            ra = adjacencies[ra].right_adjacency[s]
        if la == UNASSIGNED or ra == UNASSIGNED:
            continue

        orientation = adjacencies[la].left_end[s] > 0
        ok = True
        for s2 in range(seq_count):
            j_ori = adjacencies[la].left_end[s2] > 0
            if j_ori == orientation and \
                    adjacencies[la].right_adjacency[s2] != ra:
                ok = False
                break
            if j_ori != orientation and \
                    adjacencies[la].left_adjacency[s2] != ra:
                ok = False
                break
            if (adjacencies[ra].left_end[s2] > 0) != j_ori:
                ok = False
                break
        if not ok or adjacencies[la].to_be_deleted \
                or adjacencies[ra].to_be_deleted:
            continue

        id_remaps.append((adjacencies[ra].lcb_id, la))
        adjacencies[ra].lcb_id = la
        scores[la] += scores[ra]
        adjacencies[la].weight += adjacencies[ra].weight
        for s2 in range(seq_count):
            j_ori = adjacencies[la].left_end[s2] > 0
            rr = adjacencies[ra].right_adjacency[s2]
            rl = adjacencies[ra].left_adjacency[s2]
            if j_ori == orientation:
                adjacencies[la].right_end[s2] = adjacencies[ra].right_end[s2]
                adjacencies[la].right_adjacency[s2] = rr
                if rr != UNASSIGNED:
                    adjacencies[rr].left_adjacency[s2] = la
            else:
                adjacencies[la].left_end[s2] = adjacencies[ra].left_end[s2]
                adjacencies[la].left_adjacency[s2] = rl
                if rl != UNASSIGNED:
                    adjacencies[rl].right_adjacency[s2] = la
        removed_count += 1

    impact = sorted({i for i in impact if i != UNASSIGNED})
    return removed_count, id_remaps, impact
