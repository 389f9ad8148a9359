"""Parity of canonical seed keys vs the bit-exact oracle port.

The device kernel uses right-aligned keys (content<<1 | strand); the
reference uses left-aligned 64-bit mers with the strand bit at bit 0
(SortedMerList.cpp:597-769).  The two must be related by an exact bit
remapping (hence order-equivalent), per position, for every seed.
"""

import numpy as np
import pytest

from libmems_tpu import seeds as seedlib
from libmems_tpu.ops.mers import canonical_seed_keys, canonical_seed_keys_np
from libmems_tpu.sequence import translate_dna
from tests.oracle.refimpl import OracleSML

ALPHA = "ACGT"


def random_seq(rng, n):
    return "".join(rng.choice(list(ALPHA), size=n))


@pytest.mark.parametrize("weight,rank", [(5, 0), (7, 0), (9, 0), (9, 1),
                                         (11, 0), (11, 3), (15, 0), (21, 0)])
def test_key_matches_oracle(weight, rank):
    seed = seedlib.get_seed(weight, rank)
    rng = np.random.default_rng(weight * 100 + rank)
    seq = random_seq(rng, 400)
    oracle = OracleSML(seq, seed)
    keys = np.asarray(canonical_seed_keys(translate_dna(seq), seed))
    w = seedlib.seed_weight(seed)
    assert len(keys) == oracle.sml_len
    for p in range(oracle.sml_len):
        mer = oracle.get_dna_seed_mer(p)
        expect = ((mer >> (64 - 2 * w)) << 1) | (mer & 1)
        assert int(keys[p]) == expect, f"pos {p}"


def test_np_twin_matches_jax():
    seed = seedlib.get_seed(9, 0)
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=1000).astype(np.uint8)
    import jax.numpy as jnp
    a = np.asarray(canonical_seed_keys(jnp.asarray(codes), seed))
    b = canonical_seed_keys_np(codes, seed)
    np.testing.assert_array_equal(a, b)


def test_solid_seed_keys():
    seed = seedlib.solid_seed(5)
    keys = np.asarray(canonical_seed_keys(translate_dna("ACGTACGTA"), seed))
    oracle = OracleSML("ACGTACGTA", seed)
    for p in range(oracle.sml_len):
        mer = oracle.get_dna_seed_mer(p)
        expect = ((mer >> (64 - 2 * 5)) << 1) | (mer & 1)
        assert int(keys[p]) == expect


def test_palindrome_prefers_forward():
    # a self-reverse-complement window: fwd == rc content, strand bit 0 wins
    seed = seedlib.solid_seed(4)
    keys = np.asarray(canonical_seed_keys(translate_dna("ACGT"), seed))
    assert keys[0] & 1 == 0


def test_sort_order_equivalence():
    """Sorting by our key must equal sorting by the reference's mer."""
    seed = seedlib.get_seed(7, 0)
    rng = np.random.default_rng(42)
    seq = random_seq(rng, 600)
    oracle = OracleSML(seq, seed)
    ref_order = [p for (_, p) in oracle.sorted_mers()]
    keys = np.asarray(canonical_seed_keys(translate_dna(seq), seed))
    ours = np.lexsort((np.arange(len(keys)), keys))
    assert list(ours) == ref_order
