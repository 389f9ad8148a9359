"""Concurrent executable prewarming.

On the remote-TPU backend the dominant cost of many pipeline stages is
not compute but loading the (persistently cached) compiled executable
into the process: measured 13-24 s PER kernel, serialized across stages
(PERF.md rule 12).  Loads are latency-bound and parallelize almost
perfectly across Python threads — two loads that take 37 s back to back
finish in 5 s when issued concurrently.

This module fires best-effort daemon threads that trigger the known
first-call kernels of a pipeline with dummy inputs of the exact shapes
the real calls will use, so their loads overlap with each other and
with host-side work.  Warm calls execute once on garbage data (cheap:
all-sentinel tables produce no matches) and populate jax's normal
dispatch cache, which the real calls then hit.

The reference has no analog (single-process, no device): this is purely
a property of the TPU runtime.
"""

from __future__ import annotations

import os
import threading

import numpy as np

_ENABLED = os.environ.get("LIBMEMS_TPU_PREWARM", "1") != "0"

# configs warmed this process: warming exists to overlap FIRST-call
# executable loads; once a configuration has been warmed, its
# executables are resident and re-running the warm bodies would only
# occupy the device queue next to the real marginal work (measured as
# multi-second sml_build inflation on second-family runs)
_WARMED: set = set()


def _once(key) -> bool:
    if key in _WARMED:
        return False
    _WARMED.add(key)
    return True


def spawn(fn, name: str) -> threading.Thread | None:
    """Run fn on a best-effort daemon thread (exceptions swallowed —
    warming must never fail a pipeline).  Disabled under multi-host
    execution: concurrent local dispatches next to process-spanning
    collective programs buy nothing there and complicate enqueue-order
    reasoning."""
    if not _ENABLED:
        return None
    try:
        import jax
        if jax.process_count() > 1:
            return None
    except Exception:
        pass

    def run():
        try:
            fn()
        except Exception:
            pass

    t = threading.Thread(target=run, name=f"prewarm-{name}", daemon=True)
    t.start()
    return t


def _warm_sml_create(bucket_lens: set[int], seed: int,
                     any_ambig: bool = False):
    from libmems_tpu.sml import SortedMerList

    def run():
        for L in sorted(bucket_lens):
            SortedMerList.create(np.zeros(L, dtype=np.uint8), seed)
            if any_ambig:
                # genomes containing an ambiguous base trace a DIFFERENT
                # executable (canonical_seed_keys takes an extra ambig
                # operand), so warm that variant too — otherwise real
                # FASTA inputs with Ns still pay the serialized load
                a = np.zeros(L, dtype=bool)
                a[0] = True
                SortedMerList.create(np.zeros(L, dtype=np.uint8), seed,
                                     ambig=a)

    return run


def _warm_pairwise_seeder(n_windows: list[int], seed: int,
                          repeat_limit: int):
    """Warm the fused pairwise seeder executable for the exact layout
    find_pairwise_mums will derive from these genome window counts."""

    def run():
        import jax.numpy as jnp

        from libmems_tpu import seeds as seedlib
        from libmems_tpu.matchfind import (_PAIRWISE_FUSED_MAX_ROWS,
                                           _fused_pairwise_pipeline,
                                           _padded_table_meta,
                                           pairwise_fused_fits)
        from libmems_tpu.sml import _bucket_len

        G = len(n_windows)
        total = sum(n_windows)
        seed_len = seedlib.seed_length(seed)
        # mirror find_pairwise_mums' bucket-stable layout exactly
        # (PERF.md rule 29): per-genome padded window counts, gid/pos
        # from the jitted bucket helper, one table for both key inputs
        bl = tuple(_bucket_len(n + seed_len - 1) - seed_len + 1
                   for n in n_windows)
        total_p = sum(bl)
        pos_bits = max(max(bl, default=1).bit_length(), 8)
        rid_bits = (2 * total_p + 1).bit_length()
        if not (pairwise_fused_fits(G, pos_bits, rid_bits)
                and (G - 1) * total_p <= _PAIRWISE_FUSED_MAX_ROWS
                and total > 0 and G <= 62):
            return
        chunk = max(seed_len, 256)
        # all-sentinel tables: every row is one masked run, no seeds
        # survive, so the warm execution's compute is negligible
        from libmems_tpu.ops.mers import key_dtype
        kdtype = key_dtype(seed)
        sent = ~jnp.zeros((), kdtype)
        keys_posorder = jnp.full((total_p,), sent, kdtype)
        cnts = jnp.asarray(np.asarray(n_windows, np.int32))
        gid, pos = _padded_table_meta(bl, cnts)
        offs = jnp.asarray(np.concatenate(
            [[0], np.cumsum(bl)[:-1]]).astype(np.int32))
        ec = min(1 << 14, 1 << (max(total, 2) - 1).bit_length())
        _fused_pairwise_pipeline(seed_len, chunk, G, pos_bits, rid_bits,
                                 ec, repeat_limit, keys_posorder,
                                 keys_posorder, gid, pos, offs, cnts)

    return run


def _warm_pair_mum_finder(n_windows: list[int], seed: int,
                          repeat_limit: int):
    """Warm the fused G=2 MUM pipeline (find_mums_device's pair fast
    path) for the exact padded layout these window counts produce."""

    def run():
        import jax.numpy as jnp

        from libmems_tpu import seeds as seedlib
        from libmems_tpu.matchfind import (_fused_pair_pipeline,
                                           _pair_pos_bits)
        from libmems_tpu.ops.mers import key_dtype
        from libmems_tpu.sml import _bucket_len

        if len(n_windows) != 2:
            return
        total = sum(n_windows)
        seed_len = seedlib.seed_length(seed)
        weight = seedlib.seed_weight(seed)
        chunk = max(seed_len, 256)
        ec = min(1 << 14, 1 << max((total - 1).bit_length() - 1, 1))
        pads = [_bucket_len(n) for n in n_windows]
        pads = [_bucket_len(p + 1) if p - n == 1 else p
                for p, n in zip(pads, n_windows)]
        pb = _pair_pos_bits(max(pads))
        if not (2 * weight + 3 + pb <= 64 and pb <= 30):
            return
        kdtype = key_dtype(seed)
        sent = ~jnp.zeros((), kdtype)
        keys_a = jnp.full((pads[0],), sent, kdtype)
        keys_b = jnp.full((pads[1],), sent, kdtype)
        keys_posorder = jnp.concatenate([keys_a, keys_b])
        cnts = jnp.asarray(np.asarray(n_windows, np.int32))
        offs = jnp.asarray(np.array([0, pads[0]], np.int32))
        _fused_pair_pipeline(seed_len, chunk, pb, ec, repeat_limit,
                             keys_posorder, keys_a, keys_b, offs, cnts)

    return run


def prewarm_pair_align(genomes, seed: int,
                       repeat_limit: int) -> list[threading.Thread]:
    """Warm threads for the flat pair aligner's first device calls:
    SML build kernels + the fused pair MUM pipeline."""
    if not _ENABLED or len(genomes) != 2:
        return []
    from libmems_tpu import seeds as seedlib
    from libmems_tpu.sml import _bucket_len

    seed_len = seedlib.seed_length(seed)
    buckets: set[int] = set()
    n_windows: list[int] = []
    any_ambig = False
    for g in genomes:
        L = len(g.codes) + (seed_len - 1 if g.circular else 0)
        buckets.add(_bucket_len(L))
        n_windows.append(max(L - seed_len + 1, 0))
        any_ambig = any_ambig or bool(g.ambig.any())
    if not _once(("pair", tuple(sorted(buckets)),
                  tuple(_bucket_len(n) for n in n_windows),
                  (sum(n_windows) - 1).bit_length(),   # sizes ec (static)
                  seed, any_ambig, repeat_limit)):
        return []
    threads = [spawn(_warm_sml_create(buckets, seed, any_ambig), "sml"),
               spawn(_warm_pair_mum_finder(n_windows, seed,
                                           repeat_limit), "pairmum")]
    return [t for t in threads if t is not None]


def prewarm_pairwise(genomes, seed: int,
                     repeat_limit: int) -> list[threading.Thread]:
    """Fire warm threads for the SML-build kernels and the fused
    pairwise seeder, shapes derived exactly from the genome lengths
    (n_windows = padded_len - seed_len + 1 matches SortedMerList.create
    on the same codes)."""
    if not _ENABLED:
        return []
    from libmems_tpu import seeds as seedlib
    from libmems_tpu.sml import _bucket_len

    seed_len = seedlib.seed_length(seed)
    buckets: set[int] = set()
    n_windows: list[int] = []
    any_ambig = False
    for g in genomes:
        L = len(g.codes) + (seed_len - 1 if g.circular else 0)
        buckets.add(_bucket_len(L))
        n_windows.append(max(L - seed_len + 1, 0))
        any_ambig = any_ambig or bool(g.ambig.any())
    if not _once(("pairwise", tuple(sorted(buckets)),
                  tuple(_bucket_len(n) for n in n_windows),
                  max(sum(n_windows), 2).bit_length(),  # sizes ec (static)
                  seed, any_ambig, repeat_limit)):
        return []
    threads = [spawn(_warm_sml_create(buckets, seed, any_ambig), "sml"),
               spawn(_warm_pairwise_seeder(n_windows, seed,
                                           repeat_limit), "seeder")]
    return [t for t in threads if t is not None]
