"""Fused device pipeline must match the exact host find_mums."""

import numpy as np

from libmems_tpu import seeds as seedlib
from libmems_tpu.match import MatchArray
from libmems_tpu.matchfind import find_mums, find_mums_device
from libmems_tpu.sequence import Genome
from libmems_tpu.sml import create_smls

ALPHA = np.array(list("ACGT"))


def rc(s):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    return "".join(comp[c] for c in reversed(s))


def _device_result(smls, **kw) -> MatchArray:
    starts, lengths, valid, n_rows, n_reps = find_mums_device(smls, **kw)
    starts = np.asarray(starts)
    lengths = np.asarray(lengths)
    valid = np.asarray(valid)
    return MatchArray(starts[valid].astype(np.int64),
                      lengths[valid].astype(np.int64))


def _mk(seqs, seed):
    genomes = [Genome.from_string(s) for s in seqs]
    smls, _ = create_smls(genomes, seed)
    return smls


def test_fused_matches_host_simple():
    rng = np.random.default_rng(0)
    a = "".join(rng.choice(ALPHA, size=600))
    chars = np.array(list(a))
    idx = rng.random(len(chars)) < 0.03
    chars[idx] = rng.choice(ALPHA, size=idx.sum())
    b = "".join(chars)
    seed = seedlib.get_seed(9, 0)
    smls = _mk([a, b], seed)
    got = _device_result(smls)
    want = find_mums(smls)
    assert got.key_set() == want.key_set()


def test_fused_matches_host_rearranged():
    rng = np.random.default_rng(1)
    blocks = ["".join(rng.choice(ALPHA, size=150)) for _ in range(4)]
    a = "".join(blocks)
    b = blocks[2] + blocks[0] + rc(blocks[3]) + blocks[1]
    seed = seedlib.get_seed(7, 0)
    smls = _mk([a, b], seed)
    got = _device_result(smls)
    want = find_mums(smls)
    assert got.key_set() == want.key_set()


def test_fused_three_genomes():
    rng = np.random.default_rng(2)
    a = "".join(rng.choice(ALPHA, size=400))

    def mut(s, r):
        chars = np.array(list(s))
        idx = rng.random(len(chars)) < r
        chars[idx] = rng.choice(ALPHA, size=idx.sum())
        return "".join(chars)

    seqs = [a, mut(a, 0.02), mut(a, 0.05)]
    seed = seedlib.get_seed(9, 0)
    smls = _mk(seqs, seed)
    got = _device_result(smls)
    want = find_mums(smls)
    assert got.key_set() == want.key_set()


def test_capacity_counters():
    rng = np.random.default_rng(3)
    a = "".join(rng.choice(ALPHA, size=300))
    seed = seedlib.get_seed(9, 0)
    smls = _mk([a, a], seed)
    _, _, valid, n_rows, n_reps = find_mums_device(smls)
    assert int(n_reps) <= int(n_rows)
    assert int(np.asarray(valid).sum()) <= int(n_reps)


def test_pairwise_fused_fits_covers_baseline_configs():
    """The fused pairwise seeder must engage for every BASELINE-scale
    shape (9 x 1 Mbp through 30 x 5 Mbp); the budget predicate mirrors
    the kernel's packed-word shifts exactly."""
    from libmems_tpu.matchfind import pairwise_fused_fits

    def bits(G, n_windows):
        pos_bits = max(int(n_windows).bit_length(), 8)
        rid_bits = (2 * G * n_windows + 1).bit_length()
        return pos_bits, rid_bits

    for G, L in [(2, 4_600_000), (9, 1_000_000), (9, 5_000_000),
                 (30, 5_000_000)]:
        pb, rb = bits(G, L)
        assert pairwise_fused_fits(G, pb, rb), (G, L)
    # and the genuine over-budget cases still fall back
    pb, rb = bits(2, 1 << 40)
    assert not pairwise_fused_fits(2, pb, rb)
    assert not pairwise_fused_fits(64, *bits(64, 1000))
