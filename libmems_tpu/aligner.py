"""Flat N-way aligner orchestration (Mauve 1.x pipeline).

Equivalent of Aligner::align (libMems/Aligner.cpp:2193-2286) in its
anchors-only configuration:

  find multi-MUMs -> EliminateOverlaps -> MultiplicityFilter(n) ->
  LCB formation (breakpoint analysis) -> greedy breakpoint elimination
  at a minimum LCB weight -> Interval list (-> XMFA).

The reference's optional stages — recursive inter-anchor re-search
(Recursion, Aligner.cpp:1078), LCB extension (SearchLCBGaps :784), and
MUSCLE gapped alignment (AlignLCBInParallel :1293) — are layered on top:
recursion/gap alignment arrive with the gapped-alignment milestone; with
``gapped_alignment=False`` this matches the reference's
--no-gapped-alignment mode (Aligner.cpp:2275-2276: intervals contain
anchors plus unaligned staircase regions).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from libmems_tpu.gbe import eliminate_below_weight, surviving_members
from libmems_tpu.interval import Interval, IntervalList, interval_from_matches
from libmems_tpu.lcb import compute_lcb_set, eliminate_overlaps
from libmems_tpu.match import MatchArray
from libmems_tpu.matchfind import find_mums
from libmems_tpu.sequence import Genome
from libmems_tpu.sml import create_smls
from libmems_tpu import seeds as seedlib


@dataclass
class AlignerConfig:
    """Typed configuration for the flat aligner (replaces the setter
    methods on Aligner, libMems/Aligner.h:180-196)."""

    seed: int | None = None           # spaced seed pattern; None = default
    seed_rank: int = 0
    min_lcb_weight: float | None = None  # None = 3 * seed_weight * n
    repeat_tolerance: int = 0
    gapped_alignment: bool = False    # anchors-only when False


def align(genomes: list[Genome], config: AlignerConfig | None = None
          ) -> tuple[IntervalList, MatchArray]:
    """Run the flat N-way anchoring pipeline; returns (intervals, mums)."""
    cfg = config or AlignerConfig()
    seq_count = len(genomes)
    if seq_count < 2:
        raise ValueError("need at least two genomes")

    smls, seed = create_smls(genomes, cfg.seed, cfg.seed_rank)
    mums = find_mums(smls, repeat_tolerance=cfg.repeat_tolerance)

    # Step 2-3 (Aligner.cpp:2217-2247): overlap trim, then keep only
    # full n-way multi-MUMs
    mums = eliminate_overlaps(mums)
    mums = mums.multiplicity_filter(seq_count)
    if len(mums) == 0:
        return IntervalList([], list(genomes)), mums

    # Step 4-7: LCB formation + greedy elimination at minimum weight
    min_weight = cfg.min_lcb_weight
    if min_weight is None:
        min_weight = 3 * seedlib.seed_weight(seed) * seq_count
    lcbs = compute_lcb_set(mums)
    eliminate_below_weight(lcbs, float(min_weight))
    members = surviving_members(lcbs)

    intervals = [interval_from_matches(mums, idx) for idx in members]
    return IntervalList(intervals, list(genomes)), mums
