"""Bitonic merge of pre-sorted per-genome seed-word arrays.

The reference merges per-genome SMLs with a streaming k-way cursor merge
(MatchFinder::SearchRange, libMems/MatchFinder.cpp:172-340).  Since each
genome's words are ALREADY sorted at SML build, concat(A ascending, INF
padding, B descending) is a bitonic sequence and a bitonic merge network
sorts it in log2(N) rounds of elementwise min/max.

MEASURED OUTCOME (v5e, 9.2M u64, PERF.md): 246ms vs 88ms for
`lax.sort` of the concatenation — XLA materializes every
reshape/min/max/stack stage as separate HBM-bound kernels with layout
changes, so the 24 "cheap" passes cost ~3x a full sort.  The production
pipeline therefore uses lax.sort (matchfind._fused_pair_pipeline,
presorted=False); this kernel is kept as the reference implementation
for a future Pallas in-VMEM merge, where stages below the block size
collapse into one memory pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(2,))
def bitonic_merge(a: jax.Array, b: jax.Array, out_len: int) -> jax.Array:
    """Merge two ascending uint64 arrays into one ascending array.

    out_len must equal len(a) + len(b) (static).  Padding uses the
    all-ones sentinel, so callers must not use ~0 as a real value.
    """
    n = out_len
    m = 1 << max((n - 1).bit_length(), 1)
    inf = ~jnp.zeros((), jnp.uint64)
    pad = m - n
    # ascending(A) | INF plateau | descending(B): bitonic
    seq = jnp.concatenate([
        a, jnp.full((pad,), inf, jnp.uint64), b[::-1]])
    d = m >> 1
    while d >= 1:
        x = seq.reshape(-1, 2, d)
        lo = jnp.minimum(x[:, 0, :], x[:, 1, :])
        hi = jnp.maximum(x[:, 0, :], x[:, 1, :])
        seq = jnp.stack([lo, hi], axis=1).reshape(-1)
        d >>= 1
    return seq[:n]
