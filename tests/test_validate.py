"""Runtime self-validation invariants applied to real pipeline outputs
(the reference's debug_aligner checker family as property tests,
SURVEY §4.1)."""

import numpy as np
import pytest

from libmems_tpu.aligner import AlignerConfig, align
from libmems_tpu.lcb import compute_lcb_set
from libmems_tpu.matchfind import find_mums
from libmems_tpu.progressive import ProgressiveConfig, progressive_align
from libmems_tpu.sequence import Genome
from libmems_tpu.sml import create_smls
from libmems_tpu.validate import (ValidationError, check_no_all_gap_columns,
                                  validate_interval_list, validate_lcb)

ALPHA = np.array(list("ACGT"))


def _seq(rng, n):
    return "".join(ALPHA[rng.integers(0, 4, n)])


def _mutate(rng, s, rate):
    a = np.frombuffer(s.encode(), dtype=np.uint8).copy()
    idx = rng.random(len(a)) < rate
    a[idx] = np.frombuffer("".join(
        ALPHA[rng.integers(0, 4, int(idx.sum()))]).encode(), np.uint8)
    return a.tobytes().decode()


def _rearranged_pair(rng, n=6000):
    s = _seq(rng, n)
    thirds = [s[:n // 3], s[n // 3:2 * n // 3], s[2 * n // 3:]]
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    inv = "".join(comp[c] for c in reversed(thirds[2]))
    other = thirds[0] + inv + thirds[1]
    return s, _mutate(rng, other, 0.01)


@pytest.mark.parametrize("seed", [0, 1])
def test_flat_aligner_output_validates(seed):
    rng = np.random.default_rng(seed)
    a, b = _rearranged_pair(rng)
    genomes = [Genome.from_string(a), Genome.from_string(b)]
    ivs, mums = align(genomes, AlignerConfig(gapped_alignment=True))
    validate_interval_list(ivs)
    for iv in ivs.intervals:
        if int((iv.left_ends() != 0).sum()) >= 2:
            check_no_all_gap_columns(iv.render(genomes))


@pytest.mark.slow
def test_progressive_output_validates():
    rng = np.random.default_rng(3)
    anc = _seq(rng, 5000)
    genomes = [Genome.from_string(_mutate(rng, anc, 0.02))
               for _ in range(3)]
    ivs, _ = progressive_align(
        genomes, ProgressiveConfig(refine=False, use_bp_distance=False))
    validate_interval_list(ivs)


def test_lcb_invariants_from_pipeline():
    rng = np.random.default_rng(5)
    a, b = _rearranged_pair(rng)
    smls, seed = create_smls(
        [Genome.from_string(a), Genome.from_string(b)], None)
    mums = find_mums(smls)
    lset = compute_lcb_set(mums)
    for idx in lset.members:
        order = np.argsort(np.abs(mums.starts[idx, 0]))
        validate_lcb(mums.starts[idx][order], mums.lengths[idx][order])


def test_validators_catch_corruption():
    rng = np.random.default_rng(7)
    a, b = _rearranged_pair(rng)
    genomes = [Genome.from_string(a), Genome.from_string(b)]
    ivs, _ = align(genomes, AlignerConfig(gapped_alignment=True))
    validate_interval_list(ivs)
    # corrupt: shift one interval's start so the partition breaks
    iv = next(iv for iv in ivs.intervals
              if int(iv.left_ends()[0]) not in (0, 1))
    blk = iv.blocks[0]
    blk.starts = blk.starts.copy()
    blk.starts[0] += 3 if blk.starts[0] > 0 else -3
    with pytest.raises(ValidationError):
        validate_interval_list(ivs)
    # all-gap column detection
    rows = np.full((2, 5), ord("A"), np.uint8)
    rows[:, 2] = ord("-")
    with pytest.raises(ValidationError):
        check_no_all_gap_columns(rows)
    # overlapping LCB matches
    starts = np.array([[10, 10], [20, 15]], dtype=np.int64)
    lengths = np.array([15, 10], dtype=np.int64)
    with pytest.raises(ValidationError):
        validate_lcb(starts, lengths)
