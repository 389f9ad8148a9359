"""Bitonic merge kernels: XLA network and Pallas blocked network
(interpret mode on CPU) vs np.sort ground truth."""

import numpy as np
import pytest
import jax.numpy as jnp

from libmems_tpu.ops.merge import bitonic_merge, bitonic_merge_pallas


@pytest.mark.parametrize("na,nb", [
    (1000, 900), (1 << 14, 1 << 14), (3, 70_000), (65_536, 1),
])
def test_xla_bitonic_merge(na, nb):
    rng = np.random.default_rng(na + nb)
    a = np.sort(rng.integers(0, 1 << 62, size=na).astype(np.uint64))
    b = np.sort(rng.integers(0, 1 << 62, size=nb).astype(np.uint64))
    got = np.asarray(bitonic_merge(jnp.asarray(a), jnp.asarray(b),
                                   na + nb))
    assert np.array_equal(got, np.sort(np.concatenate([a, b])))


@pytest.mark.parametrize("na,nb", [
    (300_000, 280_000), (1 << 17, 1 << 17), (5, 130_000),
])
def test_pallas_bitonic_merge_interpret(na, nb):
    """The blocked Pallas network in interpreter mode: exercises the
    cross-block stages, the in-VMEM row stages, and the transposed
    lane stages, with duplicate keys and u64 values above 2^32."""
    rng = np.random.default_rng(7)
    a = np.sort(rng.integers(0, 1 << 62, size=na).astype(np.uint64))
    b = np.sort(rng.integers(0, 1 << 62, size=nb).astype(np.uint64))
    got = np.asarray(bitonic_merge_pallas(
        jnp.asarray(a), jnp.asarray(b), na + nb, True))
    assert np.array_equal(got, np.sort(np.concatenate([a, b])))


def test_pallas_merge_duplicates_and_low_bits():
    """hi-word ties must be broken by the lo word."""
    rng = np.random.default_rng(3)
    base = rng.integers(0, 8, size=200_000).astype(np.uint64) << np.uint64(32)
    lo = rng.integers(0, 1 << 32, size=200_000).astype(np.uint64)
    vals = base | lo
    a = np.sort(vals[:120_000])
    b = np.sort(vals[120_000:])
    got = np.asarray(bitonic_merge_pallas(
        jnp.asarray(a), jnp.asarray(b), len(vals), True))
    assert np.array_equal(got, np.sort(vals))
