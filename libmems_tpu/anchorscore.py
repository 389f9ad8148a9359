"""Seed occurrence frequencies + uniqueness-scaled anchor scoring.

Equivalents of:

* SeedOccurrenceList (libMems/SeedOccurrenceList.h:22-92): per-position
  seed frequency = the SML run length of the seed starting at that
  position, then a trailing-window mean over seed_length positions
  ("average frequency of all k-mers containing the position"), floor 1;
* GetPairwiseAnchorScore (libMems/GreedyBreakpointElimination.h:403-474)
  with the reference defaults (penalize_gaps for gapped chunks only,
  penalize_repeats=false, GBE.cpp:37): per column, HOXD70 substitution
  score between the oriented characters, positive scores divided by the
  product of the two genomes' seed frequencies at the column's
  forward-strand offsets from the match left ends.

Both are flat vector passes (run-length scatter + sliding mean; gather +
segment-sum), computed here with numpy over the whole match set at once —
the shapes are data-dependent and the arithmetic is memory-bound, so the
win comes from vectorization, not the MXU.
"""

from __future__ import annotations

import numpy as np

from libmems_tpu.match import MatchArray, NO_MATCH
from libmems_tpu.ops.gapped import HOXD70
from libmems_tpu.sml import SortedMerList


def seed_occurrence_list(sml: SortedMerList) -> np.ndarray:
    """float32[genome_length] smoothed per-position seed frequency
    (SeedOccurrenceList::construct + smoothFrequencies)."""
    total_len = sml.length
    seed_len = sml.seed_length
    n = sml.n_windows
    count = np.ones(total_len, dtype=np.float64)
    if n > 0:
        skeys = np.asarray(sml.sorted_keys) >> 1   # content only
        spos = np.asarray(sml.sorted_positions)
        change = np.concatenate([[True], skeys[1:] != skeys[:-1]])
        run_id = np.cumsum(change) - 1
        run_len = np.bincount(run_id)
        count[spos] = run_len[run_id]

    # trailing mean over seed_length positions: smoothed[i] =
    # mean(orig[i-seed_len+1 .. i]), positions before 0 counted as 1
    # (SeedOccurrenceList.h:76-92; the final position keeps its raw value
    # exactly like the reference loop, which stops at Length()-1)
    if total_len > 1 and seed_len > 0:
        orig = count.copy()
        padded = np.concatenate([np.ones(seed_len - 1), orig])
        csum = np.concatenate([[0.0], np.cumsum(padded)])
        smoothed = (csum[seed_len:] - csum[:-seed_len]) / seed_len
        count[:-1] = smoothed[:-1]
    return np.maximum(count, 1.0).astype(np.float32)


def pairwise_anchor_scores(matches: MatchArray, gi: int, gj: int,
                           codes: list[np.ndarray],
                           sols: list[np.ndarray]) -> np.ndarray:
    """Per-match uniqueness-scaled substitution score between genomes
    gi and gj (GetPairwiseAnchorScore over ungapped matches).

    Matches not including both genomes score 0.  codes[g] are 2-bit
    genome codes; sols[g] the seed-occurrence arrays.
    """
    n = len(matches)
    out = np.zeros(n, dtype=np.float64)
    si = matches.starts[:, gi]
    sj = matches.starts[:, gj]
    sel = (si != NO_MATCH) & (sj != NO_MATCH)
    if not sel.any():
        return out
    idx = np.flatnonzero(sel)
    L = matches.lengths[idx]
    si, sj = si[idx], sj[idx]

    total = int(L.sum())
    mid = np.repeat(np.arange(len(idx)), L)
    starts_flat = np.concatenate([[0], np.cumsum(L)[:-1]])
    col = np.arange(total) - starts_flat[mid]

    def oriented(codes_g, s, lens):
        le = np.abs(s) - 1
        fwd = s > 0
        pos = np.where(fwd[mid], le[mid] + col,
                       le[mid] + lens[mid] - 1 - col)
        c = codes_g[pos]
        return np.where(fwd[mid], c, 3 - c)

    ci = oriented(codes[gi], si, L)
    cj = oriented(codes[gj], sj, L)
    sub = HOXD70[ci, cj].astype(np.float64)

    lei = (np.abs(si) - 1)[mid] + col
    lej = (np.abs(sj) - 1)[mid] + col
    uni = sols[gi][np.minimum(lei, len(sols[gi]) - 1)].astype(np.float64) \
        * sols[gj][np.minimum(lej, len(sols[gj]) - 1)].astype(np.float64)
    uni = np.maximum(uni, 1.0)
    scaled = np.where(sub > 0, sub / uni, sub)
    np.add.at(out, idx[mid], scaled)
    return out


def sum_of_pairs_anchor_scores(matches: MatchArray,
                               codes: list[np.ndarray],
                               sols: list[np.ndarray],
                               pairs: list[tuple[int, int]] | None = None
                               ) -> np.ndarray:
    """Σ over genome pairs of pairwise anchor scores (the progressive
    aligner's tm_score_array collapsed over its pair axes,
    ProgressiveAligner::pairwiseScoreTrackingMatches, PA.cpp:1790)."""
    G = matches.seq_count
    if pairs is None:
        pairs = [(i, j) for i in range(G) for j in range(i + 1, G)]
    total = np.zeros(len(matches), dtype=np.float64)
    for i, j in pairs:
        total += pairwise_anchor_scores(matches, i, j, codes, sols)
    return total
