"""Seed families: gap re-search with multiple same-weight seed patterns
(pairwiseAnchorSearch seed_count=3, ProgressiveAligner.cpp:619-651)."""

import numpy as np

from libmems_tpu import seeds as seedlib
from libmems_tpu.recursion import search_gap
from libmems_tpu.sequence import Genome


def _mk(seq: str) -> Genome:
    return Genome.from_string(seq)


def test_seed_families_superset_of_single_seed():
    rng = np.random.default_rng(11)
    base = "".join("ACGT"[i] for i in rng.integers(0, 4, 4000))
    other = list(base)
    # scatter substitutions to differentiate the per-rank seed patterns
    for i in rng.integers(0, 4000, 60):
        other[i] = "ACGT"[rng.integers(0, 4)]
    genomes = [_mk(base), _mk("".join(other))]
    gs = np.array([1, 1], dtype=np.int64)
    gl = np.array([4000, 4000], dtype=np.int64)
    seed = seedlib.get_seed(11, 0)

    one = search_gap(genomes, gs, gl, seed, seed_families=1)
    fam = search_gap(genomes, gs, gl, seed, seed_families=3)
    # family search returns a collinear chain too, but built from a
    # superset of candidate anchors: coverage must not shrink
    cov_one = int(one.lengths.sum())
    cov_fam = int(fam.lengths.sum())
    assert cov_fam >= cov_one


def test_seed_families_rank_fallback():
    # a weight with fewer than 3 catalogued patterns must not raise
    genomes = [_mk("ACGTACGTACGTACGTACGTACGTACGT" * 8)] * 2
    gs = np.array([1, 1], dtype=np.int64)
    gl = np.array([len(genomes[0]), len(genomes[1])], dtype=np.int64)
    seed = seedlib.get_seed(5, 0)
    out = search_gap(genomes, gs, gl, seed, seed_families=5)
    assert out is not None
