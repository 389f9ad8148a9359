"""Loop-faithful oracle of the pre-vectorization project_matches /
_prune_column_conflicts (progressive.py r4), kept verbatim as the parity
reference for the vectorized implementations.  Mirrors
translateGappedCoordinates splitting (libMems/ProgressiveAligner.cpp:
325-527) and EliminateOverlaps_v2 greedy claims (GBE.h:328-395)."""

import numpy as np

from libmems_tpu.match import NO_MATCH
from libmems_tpu.progressive import (Anchor, _make_anchor, _project_side,
                                     _trim_anchor)


def project_matches_ref(matches, scores, aln1, aln2):
    set1 = set(aln1.leaf_ids)
    set2 = set(aln2.leaf_ids)
    anchors = []
    present = matches.starts != NO_MATCH
    for mi in range(len(matches)):
        gids = np.flatnonzero(present[mi])
        if len(gids) != 2:
            continue
        ga, gb = int(gids[0]), int(gids[1])
        if ga in set1 and gb in set2:
            g1, g2 = ga, gb
        elif gb in set1 and ga in set2:
            g1, g2 = gb, ga
        else:
            continue
        L = int(matches.lengths[mi])
        s1 = int(matches.starts[mi, g1])
        s2 = int(matches.starts[mi, g2])
        rel = (s1 > 0) == (s2 > 0)
        p1_lo = abs(s1)
        p2_lo = abs(s2)
        for b1, lo1, hi1 in _project_side(aln1, g1, p1_lo, p1_lo + L - 1):
            t_lo, t_hi = lo1 - p1_lo, hi1 - p1_lo
            if rel:
                q_lo, q_hi = p2_lo + t_lo, p2_lo + t_hi
            else:
                q_hi, q_lo = p2_lo + L - 1 - t_lo, p2_lo + L - 1 - t_hi
            for b2, lo2, hi2 in _project_side(aln2, g2, q_lo, q_hi):
                u_lo, u_hi = lo2 - q_lo, hi2 - q_lo
                if rel:
                    f_lo, f_hi = lo1 + u_lo, lo1 + u_hi
                else:
                    f_hi, f_lo = hi1 - u_lo, hi1 - u_hi
                sub_len = hi2 - lo2 + 1
                if sub_len <= 0:
                    continue
                anchors.append(_make_anchor(
                    aln1, aln2, b1, b2, g1, g2, f_lo, lo2, sub_len, rel,
                    float(scores[mi]) * sub_len / L))
    return anchors


def prune_column_conflicts_ref(aln1, aln2, anchors, min_keep=8):
    order = sorted(range(len(anchors)), key=lambda i: -anchors[i].score)
    kept = []
    iv1 = {}
    iv2 = {}

    def overlaps(ivs, blk, lo, hi):
        return [r for r in ivs.get(blk, []) if lo <= r[1] and r[0] <= hi]

    for i in order:
        a = anchors[i]
        ov1 = overlaps(iv1, a.b1, a.c1_lo, a.c1_hi)
        ov2 = overlaps(iv2, a.b2, a.c2_lo, a.c2_hi)
        if ov1 or ov2:
            a = _trim_anchor(aln1, aln2, a, ov1, ov2, min_keep)
            if a is None:
                continue
        kept.append(a)
        iv1.setdefault(a.b1, []).append((a.c1_lo, a.c1_hi))
        iv2.setdefault(a.b2, []).append((a.c2_lo, a.c2_hi))
    return kept
