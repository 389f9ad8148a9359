"""Anchoring convergence loop + per-pair gap re-search
(recurseOnPairs / alignProfileToProfile iteration, PA.cpp:680-923, 2384).

A diverged internal segment (too mutated for the top-level seed weight to
anchor densely) must gain anchors from the smaller-seed gap re-search,
measurably raising aligned coverage; and the convergence loop must
actually add anchors on a second iteration.
"""

import numpy as np
import pytest

from libmems_tpu.progressive import (ProgressiveConfig, progressive_align,
                                     align_nodes, leaf_alignment,
                                     _recurse_on_pairs, _group_anchors,
                                     _select_anchors_sp,
                                     _pair_penalties,
                                     _prune_column_conflicts,
                                     project_matches)
from libmems_tpu.anchorscore import (pairwise_anchor_scores,
                                     seed_occurrence_list)
from libmems_tpu.match import NO_MATCH
from libmems_tpu.matchfind import find_pairwise_mums
from libmems_tpu.sequence import Genome
from libmems_tpu.sml import create_smls

pytestmark = pytest.mark.slow  # multi-minute integration module

ALPHA = np.array(list("ACGT"))


def _seq(rng, n):
    return "".join(ALPHA[rng.integers(0, 4, n)])


def _mutate(rng, s, rate):
    a = np.frombuffer(s.encode(), dtype=np.uint8).copy()
    idx = rng.random(len(a)) < rate
    a[idx] = np.frombuffer("".join(
        ALPHA[rng.integers(0, 4, int(idx.sum()))]).encode(), np.uint8)
    return a.tobytes().decode()


def _divergent_pair(rng, flank=6000, mid=3000, mid_rate=0.30):
    anc = _seq(rng, 2 * flank + mid)
    child = (_mutate(rng, anc[:flank], 0.01)
             + _mutate(rng, anc[flank:flank + mid], mid_rate)
             + _mutate(rng, anc[flank + mid:], 0.01))
    return anc, child


def _repeat_pair(rng, unique=3000, rep=4000, insert=1500):
    """Two genomes with U1-R-U2-R-U3 structure, genome B carrying a
    novel insertion mid-way through its first repeat copy.  Seeds inside
    R are globally non-unique (two copies per genome) so the top-level
    pairwise-MUM search cannot anchor past the insertion — extension
    from U1 stops at the diagonal break, and the remaining R half has no
    unique seeds until U2.  Only the windowed gap re-search (where the
    single local copy IS unique) can anchor it — the reference's
    motivation for pairwiseAnchorSearch on gap windows
    (PA.cpp:589-678)."""
    u1, u2, u3 = _seq(rng, unique), _seq(rng, unique), _seq(rng, unique)
    r = _seq(rng, rep)
    ins = _seq(rng, insert)
    anc = u1 + r + u2 + r + u3
    half = unique + rep // 2
    child = anc[:half] + ins + anc[half:]
    return _mutate(rng, anc, 0.01), _mutate(rng, child, 0.01)


def _aligned_pair_columns(node_aln, g0, g1):
    """Columns where both leaves have characters in the same block."""
    r0 = node_aln.row_of(g0)
    r1 = node_aln.row_of(g1)
    total = 0
    for blk in node_aln.blocks:
        total += int((blk.bits[r0] & blk.bits[r1]).sum())
    return total


def test_gap_search_increases_aligned_coverage():
    """A diverged middle segment (mutation rate 0.56 ≈ 42% effective
    divergence) defeats the weight-15 top-level seed (intact windows
    several kb apart — farther than the gapped-window cap, so the
    middle staircases), while the gap re-search's gap-sized seeds
    (weight ~7-9) anchor it every ~100 bp.  The segment is large enough
    that its anchor-score gain clears the +0.5% convergence-acceptance
    rule (PA.cpp:2384)."""
    from libmems_tpu import seeds as seedlib
    rng = np.random.default_rng(11)
    a, b = _divergent_pair(rng, flank=3000, mid=6000, mid_rate=0.56)
    genomes = [Genome.from_string(a), Genome.from_string(b)]

    cov = {}
    for gap_search in (False, True):
        # window cap below the diverged-segment size: without gap-search
        # anchors the middle cannot be DP-aligned (staircase), with them
        # it splits into alignable windows
        cfg = ProgressiveConfig(refine=False, gap_search=gap_search,
                                use_bp_distance=False,
                                seed=seedlib.get_seed(15, 0),
                                max_gapped_window=2000)
        ivs, _tree = progressive_align(genomes, cfg)
        total = 0
        for iv in ivs.intervals:
            blk = iv.blocks[0]
            rows = blk.rows
            both = (rows[0] != ord("-")) & (rows[1] != ord("-"))
            total += int(both.sum())
        cov[gap_search] = total
    # the diverged middle only gets anchored by the smaller-seed
    # re-search; coverage must increase measurably (>5%)
    assert cov[True] > cov[False] * 1.05, cov


def test_second_iteration_adds_anchors():
    rng = np.random.default_rng(5)
    a, b = _divergent_pair(rng, flank=4000, mid=2500)
    genomes = [Genome.from_string(a), Genome.from_string(b)]
    smls, seed = create_smls(genomes, None)
    matches = find_pairwise_mums(smls)
    sols = [seed_occurrence_list(s) for s in smls]
    codes = [g.codes for g in genomes]
    scores = pairwise_anchor_scores(matches, 0, 1, codes, sols)

    aln1 = leaf_alignment(0, genomes[0])
    aln2 = leaf_alignment(1, genomes[1])
    anchors = _prune_column_conflicts(
        aln1, aln2, project_matches(matches, scores, aln1, aln2))
    pen = _pair_penalties(aln1, aln2, 7000.0, None, None)
    sel, score = _select_anchors_sp(anchors, aln1, aln2, pen)
    groups = _group_anchors(sel)

    new_ma, new_sc = _recurse_on_pairs(groups, aln1, aln2, genomes,
                                       seed, codes, sols, 24, 1)
    assert new_ma is not None and len(new_ma) > 0

    combined = _prune_column_conflicts(
        aln1, aln2, sel + project_matches(new_ma, new_sc, aln1, aln2))
    sel2, score2 = _select_anchors_sp(combined, aln1, aln2, pen)
    assert len(sel2) > len(sel)
    assert score2 > score
