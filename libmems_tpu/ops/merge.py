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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


# --------------------------------------------------------------------------
# Pallas blocked bitonic merge
# --------------------------------------------------------------------------
#
# TPUs have no native 64-bit integers, so the merge network runs on
# (hi, lo) uint32 pairs.  Stages with distance >= the VMEM block run as
# one elementwise compare-exchange kernel per stage (two HBM blocks in,
# two out); every stage with distance < the block collapses into ONE
# pass per block: the block is loaded to VMEM once and all log2(BLK)
# remaining stages run in-register — the traffic the pure-XLA network
# wastes re-materializing each stage is exactly what this kernel saves.

MERGE_BLK_ROWS = 1024          # rows of 128 lanes -> 128K elements/block
MERGE_LANES = 128


def _cmp_swap(al_hi, al_lo, ar_hi, ar_lo):
    swap = (al_hi > ar_hi) | ((al_hi == ar_hi) & (al_lo > ar_lo))
    lo_hi = jnp.where(swap, ar_hi, al_hi)
    lo_lo = jnp.where(swap, ar_lo, al_lo)
    hi_hi = jnp.where(swap, al_hi, ar_hi)
    hi_lo = jnp.where(swap, al_lo, ar_lo)
    return lo_hi, lo_lo, hi_hi, hi_lo


def _cross_stage_kernel(lh, ll, rh, rl, olh, oll, orh, orl):
    a, b, c, d = _cmp_swap(lh[...], ll[...], rh[...], rl[...])
    olh[...] = a
    oll[...] = b
    orh[...] = c
    orl[...] = d


def _inblock_kernel(xh_ref, xl_ref, oh_ref, ol_ref):
    """All stages with distance < BLK elements, one VMEM round trip.

    Block layout: (R, 128) row-major, flat element e = (e // 128,
    e % 128).  Row-distance stages reshape the sublane axis; the last
    7 lane-distance stages run on the transpose, where a flat distance
    d < 128 becomes a sublane distance."""
    R = xh_ref.shape[0]
    xh = xh_ref[...]
    xl = xl_ref[...]
    dr = R // 2
    while dr >= 1:                      # element distance dr*128
        sh = xh.reshape(R // (2 * dr), 2, dr, MERGE_LANES)
        sl = xl.reshape(R // (2 * dr), 2, dr, MERGE_LANES)
        a, b, c, d = _cmp_swap(sh[:, 0], sl[:, 0], sh[:, 1], sl[:, 1])
        xh = jnp.stack([a, c], axis=1).reshape(R, MERGE_LANES)
        xl = jnp.stack([b, d], axis=1).reshape(R, MERGE_LANES)
        dr >>= 1
    yh = xh.T                            # (128, R): flat lane distance ->
    yl = xl.T                            # sublane distance
    d = MERGE_LANES // 2
    while d >= 1:
        sh = yh.reshape(MERGE_LANES // (2 * d), 2, d, R)
        sl = yl.reshape(MERGE_LANES // (2 * d), 2, d, R)
        a, b, c, dd = _cmp_swap(sh[:, 0], sl[:, 0], sh[:, 1], sl[:, 1])
        yh = jnp.stack([a, c], axis=1).reshape(MERGE_LANES, R)
        yl = jnp.stack([b, dd], axis=1).reshape(MERGE_LANES, R)
        d >>= 1
    oh_ref[...] = yh.T
    ol_ref[...] = yl.T


@functools.partial(jax.jit, static_argnums=(2, 3))
def bitonic_merge_pallas(a: jax.Array, b: jax.Array, out_len: int,
                         interpret: bool = False) -> jax.Array:
    """Merge two ascending uint64 arrays with the blocked Pallas
    network.  out_len = len(a) + len(b) (static); ~0 must not be a real
    value (used as the padding sentinel)."""
    n = out_len
    blk = MERGE_BLK_ROWS * MERGE_LANES
    m = 1 << max((n - 1).bit_length(), 1)
    m = max(m, 2 * blk)
    inf = ~jnp.zeros((), jnp.uint64)
    seq = jnp.concatenate([
        a, jnp.full((m - n,), inf, jnp.uint64), b[::-1]])
    hi = (seq >> jnp.uint64(32)).astype(jnp.uint32).reshape(-1, MERGE_LANES)
    lo = (seq & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32
                                               ).reshape(-1, MERGE_LANES)

    nb = m // blk
    d = m >> 1
    while d >= blk:                     # cross-block stages
        db = d // blk                   # distance in blocks
        n_pairs = nb // 2

        # index maps are in units of the block shape
        def left_map(i, db=db):
            return (i // db) * 2 * db + i % db, 0

        def right_map(i, db=db):
            return (i // db) * 2 * db + i % db + db, 0

        bs = lambda mp: pl.BlockSpec((MERGE_BLK_ROWS, MERGE_LANES), mp,
                                     memory_space=pltpu.VMEM)
        hi, lo, hi2, lo2 = pl.pallas_call(
            _cross_stage_kernel,
            grid=(n_pairs,),
            in_specs=[bs(left_map), bs(left_map), bs(right_map),
                      bs(right_map)],
            out_specs=(bs(left_map), bs(left_map), bs(right_map),
                       bs(right_map)),
            out_shape=[jax.ShapeDtypeStruct(hi.shape, jnp.uint32)] * 4,
            interpret=interpret,
        )(hi, lo, hi, lo)
        # left outputs land in outputs 0/1, right outputs in 2/3 of
        # DISTINCT arrays; recombine by position parity of the block
        blk_idx = jnp.arange(m // MERGE_LANES) // MERGE_BLK_ROWS
        is_left = (blk_idx // db) % 2 == 0
        hi = jnp.where(is_left[:, None], hi, hi2)
        lo = jnp.where(is_left[:, None], lo, lo2)
        d >>= 1

    bs_seq = pl.BlockSpec(
        (MERGE_BLK_ROWS, MERGE_LANES),
        lambda i: (i, 0), memory_space=pltpu.VMEM)
    hi, lo = pl.pallas_call(
        _inblock_kernel,
        grid=(nb,),
        in_specs=[bs_seq, bs_seq],
        out_specs=(bs_seq, bs_seq),
        out_shape=[jax.ShapeDtypeStruct(hi.shape, jnp.uint32)] * 2,
        interpret=interpret,
    )(hi, lo)

    out = (hi.reshape(-1).astype(jnp.uint64) << jnp.uint64(32)) \
        | lo.reshape(-1).astype(jnp.uint64)
    return out[:n]
