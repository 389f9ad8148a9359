"""Seed-prefix-range sharding of the mer table over a device mesh.

TPU-native successor of the reference's two partitioning schemes:

* dmSML's out-of-core distribution sort — bin records by key prefix
  across scratch devices, sort bins independently (dmSML/dmsort.c);
* ParallelMemHash's chunked k-way merge with aligned chunk boundaries
  (libMems/ParallelMemHash.cpp:42-121).

Here the "scratch devices" are mesh devices and the "bins" are canonical
seed-content prefix ranges:

1. the concatenated (key, genome, position) window table is split evenly
   over the mesh ('shard' axis, data-parallel key extraction);
2. each device assigns every local row a bucket = the top
   log2(n_devices) bits of its canonical content;
3. `jax.lax.all_to_all` routes rows to their bucket owner (fixed
   per-pair capacity with sentinel padding — the static-shape analog of
   a ragged all-to-all);
4. each device sorts its received rows: equal-content runs are now
   device-local by construction, so MemHash-style seed enumeration
   (libmems_tpu.matchfind._mum_seed_flags) runs shard-locally and global
   counts are `psum`s.

Matches that straddle no boundary by construction is the key property:
the reference needed GetBreakpoint (MatchFinder.cpp:89-126) to re-align
chunk edges; prefix ownership makes the problem disappear.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from libmems_tpu import _jaxconfig  # noqa: F401
from libmems_tpu import seeds as seedlib
from libmems_tpu.ops import segments as seg

SHARD_AXIS = "shard"


def make_mesh(n_devices: int | None = None, axis: str = SHARD_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def _bucket_of(content: jax.Array, weight: int, n_devices: int) -> jax.Array:
    """Owner device of each row: top bits of the canonical content."""
    bucket_bits = max((n_devices - 1).bit_length(), 1)
    shift = max(2 * weight - bucket_bits, 0)
    b = (content >> shift).astype(jnp.int32)
    return jnp.minimum(b, n_devices - 1)


def sharded_seed_table(keys: jax.Array, gid: jax.Array, pos: jax.Array,
                       mesh: Mesh, weight: int):
    """Route windows to their content-range owners and sort shard-locally.

    Args:
      keys/gid/pos: global window table, length padded to a multiple of
        the mesh size; padding rows must carry the all-ones sentinel key.
    Returns:
      (content, gid, pos, strand) with a leading device axis; rows with
      sentinel content are padding.
    """
    n_dev = mesh.devices.size
    sentinel = jnp.array(~jnp.zeros((), keys.dtype), keys.dtype)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS)),
        out_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS),
                   P(SHARD_AXIS)))
    def route(k, g, p):
        T = k.shape[0]
        content = k >> 1
        strand = (k & 1).astype(jnp.int32)
        bucket = _bucket_of(content, weight, n_dev)
        bucket = jnp.where(k == sentinel, n_dev, bucket)  # padding last
        # order local rows by destination bucket
        bucket, k_s, g_s, p_s = jax.lax.sort(
            (bucket, k, g, p), num_keys=1, is_stable=False)
        # per-destination capacity C: static worst case is T (all rows to
        # one bucket); build the [n_dev, C] send buffer by masking
        C = T
        idx_in_bucket = jnp.arange(T, dtype=jnp.int32) - seg.start_index(
            seg.run_starts(bucket))
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (n_dev, C), 1)
        send_k = jnp.full((n_dev, C), sentinel, dtype=k.dtype)
        send_g = jnp.zeros((n_dev, C), dtype=g.dtype)
        send_p = jnp.zeros((n_dev, C), dtype=p.dtype)
        # padding rows get an out-of-range destination -> dropped
        dst = jnp.where(bucket < n_dev, bucket, n_dev)
        send_k = send_k.at[dst, idx_in_bucket].set(k_s, mode="drop")
        send_g = send_g.at[dst, idx_in_bucket].set(g_s, mode="drop")
        send_p = send_p.at[dst, idx_in_bucket].set(p_s, mode="drop")

        recv_k = jax.lax.all_to_all(send_k, SHARD_AXIS, 0, 0, tiled=False)
        recv_g = jax.lax.all_to_all(send_g, SHARD_AXIS, 0, 0, tiled=False)
        recv_p = jax.lax.all_to_all(send_p, SHARD_AXIS, 0, 0, tiled=False)
        rk = recv_k.reshape(-1)
        rg = recv_g.reshape(-1)
        rp = recv_p.reshape(-1)
        rcontent = rk >> 1
        rstrand = (rk & 1).astype(jnp.int32)
        # shard-local sort by (content, gid, pos); sentinels sort last
        rcontent, rg, rp, rstrand = jax.lax.sort(
            (rcontent, rg, rp, rstrand), num_keys=3, is_stable=False)
        return (rcontent[None], rg[None], rp[None], rstrand[None])

    return route(keys, gid, pos)


def sharded_mum_seed_count(keys: jax.Array, gid: jax.Array, pos: jax.Array,
                           mesh: Mesh, weight: int,
                           repeat_tolerance: int = 0,
                           repeat_limit: int = 1000) -> jax.Array:
    """Count surviving unique-MUM seed runs across the mesh (scalar).

    The distributed analog of _mum_seed_flags' run census: runs live
    entirely on their owner shard, so the global count is a psum of
    local counts.  Sentinel (padding) rows form a trailing pseudo-run
    that never survives (single pseudo-genome-id, high repeat count).
    """
    content, g, p, strand = sharded_seed_table(keys, gid, pos, mesh, weight)
    sentinel_content = (~jnp.zeros((), content.dtype)) >> 1

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS)),
        out_specs=P())
    def census(c, g, p):
        c, g, p = c[0], g[0], p[0]
        sc = seg.run_starts(c)
        scg = seg.run_starts(c, g)
        subrun_len = seg.run_lengths(scg)
        max_subrun = seg.segment_max_broadcast(subrun_len, sc)
        ngids = seg.segment_sum_broadcast(scg.astype(jnp.int32), sc)
        runlen = seg.run_lengths(sc)
        keep_run = (ngids >= 2) & (max_subrun <= repeat_tolerance + 1) \
            & (runlen <= repeat_limit) & (c != sentinel_content)
        local = jnp.sum((sc & keep_run).astype(jnp.int32))
        return jax.lax.psum(local, SHARD_AXIS)

    return census(content, g, p)


def pad_table_for_mesh(keys: np.ndarray, gid: np.ndarray, pos: np.ndarray,
                       n_devices: int):
    """Pad the global window table to a multiple of the mesh size with
    sentinel rows (all-ones key)."""
    n = len(keys)
    pad = (-n) % n_devices
    if pad:
        sentinel = np.array(np.iinfo(keys.dtype).max, dtype=keys.dtype)
        keys = np.concatenate([keys, np.full(pad, sentinel, keys.dtype)])
        gid = np.concatenate([gid, np.zeros(pad, gid.dtype)])
        pos = np.concatenate([pos, np.zeros(pad, pos.dtype)])
    return keys, gid, pos
