"""Canonical spaced-seed mer extraction.

TPU-native equivalent of the reference's rolling-window mer fill +
reverse-complement canonicalization (SortedMerList::FillDnaSeedSML /
GetSeedMer / GetDnaSeedMer / RevCompMer, libMems/SortedMerList.cpp:597-783).

Representation
--------------
The reference packs a mer into the TOP bits of a uint64 and reserves bit 0
as the strand bit (RevCompMer sets ``mer |= 1`` on the reverse complement,
SortedMerList.cpp:613).  We use the order-equivalent RIGHT-aligned key::

    key = (content << 1) | strand_bit

where ``content`` is the seed-weight 2-bit characters packed MSB-first.
``min(fwd_key, rc_key)`` picks the same canonical strand as the reference's
``GetDnaSeedMer`` (forward wins ties on palindromes because its strand bit
is 0), and sorting by ``key`` yields the same order as sorting the
reference's left-aligned bmers.  This equivalence is property-tested
against a bit-exact oracle in tests/oracle/refimpl.py.

Instead of a rolling 64-bit window (a sequential dependence), each of the
seed's `weight` sampled offsets becomes one strided slice of the code
array, and the packed content is a sum of shifted slices — pure vector ops
that XLA fuses into a single pass over HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from libmems_tpu import _jaxconfig  # noqa: F401  (enables x64)
from libmems_tpu import seeds as seedlib


def key_dtype(seed: int) -> jnp.dtype:
    """Smallest unsigned dtype holding (2*weight + 1)-bit canonical keys."""
    w = seedlib.seed_weight(seed)
    return jnp.uint32 if 2 * w + 1 <= 32 else jnp.uint64


@functools.partial(jax.jit, static_argnums=(1,))
def canonical_seed_keys(codes: jax.Array, seed: int) -> jax.Array:
    """Canonical seed keys for every window position of one genome.

    Args:
      codes: uint8[L] 2-bit nucleotide codes.
      seed: spaced-seed bitmask (static).

    Returns:
      keys: unsigned[n] with n = L - seed_length + 1, where
        ``key = (canonical_content << 1) | strand_bit``.
    """
    length = seedlib.seed_length(seed)
    weight = seedlib.seed_weight(seed)
    offsets = seedlib.seed_offsets(seed)
    dt = key_dtype(seed)

    L = codes.shape[0]
    n = L - length + 1
    if n <= 0:
        return jnp.zeros((0,), dtype=dt)

    fwd = jnp.zeros((n,), dtype=dt)
    rc = jnp.zeros((n,), dtype=dt)
    for j, off in enumerate(offsets):
        ch = jax.lax.slice(codes, (off,), (off + n,)).astype(dt)
        # forward: char j is the (weight-1-j)'th 2-bit group from the LSB
        fwd = fwd | (ch << (2 * (weight - 1 - j)))
        # reverse complement: complemented char j lands at group j
        rc = rc | ((3 - ch) << (2 * j))

    fwd_key = fwd << 1
    rc_key = (rc << 1) | 1
    return jnp.minimum(fwd_key, rc_key)


def canonical_seed_keys_np(codes: np.ndarray, seed: int) -> np.ndarray:
    """Numpy twin of canonical_seed_keys (host-side/oracle-free paths)."""
    length = seedlib.seed_length(seed)
    weight = seedlib.seed_weight(seed)
    offsets = seedlib.seed_offsets(seed)
    dt = np.uint32 if 2 * weight + 1 <= 32 else np.uint64
    L = len(codes)
    n = L - length + 1
    if n <= 0:
        return np.zeros((0,), dtype=dt)
    fwd = np.zeros((n,), dtype=dt)
    rc = np.zeros((n,), dtype=dt)
    for j, off in enumerate(offsets):
        ch = codes[off : off + n].astype(dt)
        fwd |= ch << dt(2 * (weight - 1 - j))
        rc |= (dt(3) - ch) << dt(2 * j)
    return np.minimum(fwd << dt(1), (rc << dt(1)) | dt(1))


def split_key(keys: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(content, strand_bit) from canonical keys."""
    return keys >> 1, (keys & 1).astype(jnp.uint8)
