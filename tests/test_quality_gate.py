"""Alignment-content quality gate (VERDICT r3 item 6).

Byte-goldens catch drift but regenerate on any intentional change; this
gate tracks CONTENT quality with tolerant thresholds instead, so a
change that silently degrades alignment quality (profile-DP
approximation, refinement regression, anchor-selection bug) fails even
after goldens are regenerated.  Metrics: sum-of-pairs score
(computeSPScore analog) and multi-aligned base coverage of the final
IntervalList (scoring.alignment_quality_stats).

Thresholds are floors/relations, not pins.  Scales are sized for the
CPU test mesh (the profile DP is TPU-shaped; CPU XLA runs it at
~0.35 M cells/s, so refine windows here stay small — bench_e2e.py
tracks the same metrics at production scale on the real chip).
"""

import numpy as np
import pytest

from libmems_tpu.scoring import alignment_quality_stats
from libmems_tpu.sequence import Genome

pytestmark = pytest.mark.slow

_LUT = np.frombuffer(b"ACGT", dtype=np.uint8)


def _family(rng, n, length, mutate=0.02):
    anc = rng.integers(0, 4, size=length).astype(np.uint8)
    out = []
    for i in range(n):
        g = anc.copy()
        idx = rng.random(length) < mutate
        g[idx] = rng.integers(0, 4, size=int(idx.sum())).astype(np.uint8)
        out.append(Genome(name=f"g{i}", ascii=_LUT[g], codes=g))
    return out


def test_pair_config_quality_floor():
    """Scaled golden config 1/3: 60 kb 1%-divergent pair with one
    inversion (measured r4: frac 0.999+, SP ~5.7e6, core ~59 k)."""
    from tests.golden import generate
    from libmems_tpu.aligner import AlignerConfig, align

    gs = generate._genomes_pair()
    ivs, _ = align(gs, AlignerConfig(gapped_alignment=True))
    q = alignment_quality_stats(ivs)
    n = len(gs[0])
    assert q["multi_aligned_base_frac"] > 0.90, q
    assert q["sp_score"] > 50 * n, q
    assert q["core_columns"] > 0.85 * n, q


def test_progressive_quality_floor():
    """5-genome 2%-divergent family, no refine (fast)."""
    from libmems_tpu.progressive import ProgressiveConfig, \
        progressive_align

    gs = _family(np.random.default_rng(11), 5, 6000)
    ivs, _ = progressive_align(gs, ProgressiveConfig(refine=False))
    q = alignment_quality_stats(ivs)
    assert q["multi_aligned_base_frac"] > 0.80, q
    assert q["core_columns"] > 0.7 * 6000, q
    assert q["sp_score"] > 0, q


def test_refine_never_regresses_sp():
    """Refinement accepts a window only when its SP improves, so the
    refined alignment's SP must not regress (quantifies what
    refineAlignment buys; PA.cpp:1118).  Small windows: CPU DP."""
    from libmems_tpu.progressive import ProgressiveConfig, \
        progressive_align

    gs = _family(np.random.default_rng(12), 4, 1500, mutate=0.05)
    ivs_off, _ = progressive_align(gs, ProgressiveConfig(refine=False))
    ivs_on, _ = progressive_align(gs, ProgressiveConfig(refine=True))
    q_off = alignment_quality_stats(ivs_off)
    q_on = alignment_quality_stats(ivs_on)
    assert q_on["sp_score"] >= q_off["sp_score"] * 0.999, (q_on, q_off)
