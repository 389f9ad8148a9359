"""Genome distance matrices for guide-tree construction.

Array-native equivalents of libMems/DistanceMatrix.h:

* identity_matrix — IdentityMatrix over a match list (h:48-105):
  identity[i,j] = Σ match lengths where both genomes participate,
  divided by min(len_i, len_j);
* distance_matrix — DistanceMatrix (h:269-273): 1 − identity
  (TransformDistanceIdentity, h:276-282);
* single_copy_distance — SingleCopyDistanceMatrix (h:194-267): per
  genome pair, the fraction of each genome's positions covered by
  columns aligned to the partner, averaged over the two genomes, then
  1 − identity.  For ungapped multi-MUM inputs the covered positions of
  a match are exactly its [left, left+len) range in each genome, so the
  bitset walk of the reference collapses to interval accumulation.

All of these are O(n·G²) vector reductions on at most a few million
matches — they run as numpy host code feeding the (tiny) NJ solve; there
is no device win at G ≤ dozens of genomes.
"""

from __future__ import annotations

import numpy as np

from libmems_tpu.match import MatchArray, NO_MATCH


def identity_matrix(matches: MatchArray,
                    seq_lengths: list[int] | np.ndarray) -> np.ndarray:
    """IdentityMatrix (libMems/DistanceMatrix.h:48-69): pairwise shared
    anchor coverage / min(genome lengths)."""
    G = matches.seq_count
    seq_lengths = np.asarray(seq_lengths, dtype=np.float64)
    present = (matches.starts != NO_MATCH).astype(np.float64)  # [n, G]
    # Σ_m len_m * present_i * present_j  ==  (present*len)^T @ present
    weighted = present * matches.lengths[:, None].astype(np.float64)
    ident = weighted.T @ present                                # [G, G]
    possible = np.minimum(seq_lengths[:, None], seq_lengths[None, :])
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(possible > 0, ident / possible, 0.0)
    return out


def distance_matrix(matches: MatchArray,
                    seq_lengths: list[int] | np.ndarray) -> np.ndarray:
    """DistanceMatrix = 1 − IdentityMatrix (DistanceMatrix.h:269-282),
    the flat aligner's guide-tree input (Aligner.cpp:2230-2240)."""
    return 1.0 - identity_matrix(matches, seq_lengths)


def _pair_coverage(starts_g: np.ndarray, lengths: np.ndarray,
                   genome_len: int) -> float:
    """Fraction of genome positions covered by the given signed starts
    (union of [|s|, |s|+len) intervals)."""
    sel = starts_g != NO_MATCH
    if not sel.any() or genome_len == 0:
        return 0.0
    lo = np.abs(starts_g[sel])
    hi = lo + lengths[sel]
    order = np.argsort(lo)
    lo, hi = lo[order], hi[order]
    # union length of sorted intervals
    run_hi = np.maximum.accumulate(hi)
    new_run = np.concatenate([[True], lo[1:] > run_hi[:-1]])
    starts_u = lo[new_run]
    ends_u = run_hi[np.concatenate([new_run[1:], [True]])]
    covered = int((ends_u - starts_u).sum())
    return covered / float(genome_len)


def single_copy_distance(matches: MatchArray,
                         seq_lengths: list[int] | np.ndarray) -> np.ndarray:
    """SingleCopyDistanceMatrix (DistanceMatrix.h:194-267) over ungapped
    matches: distance[i,j] = 1 − (coverage_i + coverage_j)/2, where
    coverage_g is the fraction of genome g's positions inside matches
    that also include the partner genome.  This is the progressive
    aligner's genome-content distance (ProgressiveAligner.cpp:3821)."""
    G = matches.seq_count
    seq_lengths = np.asarray(seq_lengths)
    dist = np.zeros((G, G), dtype=np.float64)
    present = matches.starts != NO_MATCH
    for i in range(G):
        for j in range(i + 1, G):
            both = present[:, i] & present[:, j]
            pi = _pair_coverage(matches.starts[both, i],
                                matches.lengths[both], int(seq_lengths[i]))
            pj = _pair_coverage(matches.starts[both, j],
                                matches.lengths[both], int(seq_lengths[j]))
            ident = (pi + pj) / 2.0
            dist[i, j] = dist[j, i] = 1.0 - ident
    return dist
