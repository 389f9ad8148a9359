"""Benchmark: MUM discovery throughput (bases/s) on the current backend.

Runs the fused device pipeline (canonical seed keys -> global sort ->
seed enumeration -> batched ungapped extension -> dedup) on a synthetic
E. coli-scale pair (2 x 4.6 Mbp, 1% substitutions + 0.05% indels, the
indels giving the realistic diagonal-breaking structure of a true
genome pair) and prints ONE JSON line.

vs_baseline: ratio against a single-core CPU reference throughput for
the same pipeline, measured once on this machine with numpy (the
reference C++ library publishes no numbers and cannot be built here —
BASELINE.md; numpy's sort-based pipeline is the stand-in for the
reference's fill+sort+stream-merge loops).
"""

import json
import time

import numpy as np


def _synthetic_pair(n, rng_seed=0, mutate=0.01, indel=0.0005):
    """Divergent genome pair: substitutions break spaced-seed windows,
    indels shift diagonals (without them a spaced seed extends through
    every isolated substitution and the pair collapses to one MUM)."""
    rng = np.random.default_rng(rng_seed)
    a = rng.integers(0, 4, size=n).astype(np.uint8)
    b = a.copy()
    idx = rng.random(n) < mutate
    b[idx] = rng.integers(0, 4, size=int(idx.sum())).astype(np.uint8)
    if indel > 0:
        sites = np.flatnonzero(rng.random(n) < indel)
        sizes = rng.geometric(0.5, size=len(sites))
        parts, cur = [], 0
        for s, z in zip(sites, sizes):
            if s < cur:
                continue
            parts.append(b[cur:s])
            if rng.random() < 0.5:   # insertion
                parts.append(rng.integers(0, 4, size=z).astype(np.uint8))
                cur = s
            else:                    # deletion
                cur = s + int(z)
        parts.append(b[cur:])
        b = np.concatenate(parts)[:n]
    return a, b


def _cpu_reference_bases_per_s(codes_a, codes_b, seed, sample=1 << 20):
    """Single-pass numpy estimate of CPU throughput for key extraction +
    sort + run census (the dominant reference loops: SML fill+sort +
    stream merge), measured on a sample and reported as bases/s."""
    from libmems_tpu.ops.mers import canonical_seed_keys_np

    a = codes_a[:sample]
    b = codes_b[:sample]
    t0 = time.perf_counter()
    ka = canonical_seed_keys_np(a, seed)
    kb = canonical_seed_keys_np(b, seed)
    keys = np.concatenate([ka, kb])
    gid = np.concatenate([np.zeros(len(ka), np.int32),
                          np.ones(len(kb), np.int32)])
    order = np.lexsort((gid, keys >> 1))
    content = (keys >> 1)[order]
    runs = np.concatenate([[True], content[1:] != content[:-1]])
    _ = int(runs.sum())
    dt = time.perf_counter() - t0
    return (len(a) + len(b)) / dt


def main():
    import jax
    import jax.numpy as jnp
    from libmems_tpu import seeds as seedlib
    from libmems_tpu.matchfind import find_mums_device
    from libmems_tpu.sml import SortedMerList

    L = 4_600_000
    seed = seedlib.get_seed(15, 0)
    codes_a, codes_b = _synthetic_pair(L)

    cpu_bps = _cpu_reference_bases_per_s(codes_a, codes_b, seed)

    smls = [SortedMerList.create(codes_a, seed),
            SortedMerList.create(codes_b, seed)]

    def run():
        starts, lengths, valid, n_rows, n_reps = find_mums_device(
            smls, extend_capacity=1 << 17, chunk=512)
        # fetch a value: on remote-TPU backends block_until_ready alone
        # does not guarantee execution finished
        return int(n_rows)

    n_rows = run()  # compile + warm
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters

    bases = 2 * L
    bps = bases / dt
    print(json.dumps({
        "metric": "mum_find_bases_per_s",
        "value": round(bps, 1),
        "unit": "bases/s",
        "vs_baseline": round(bps / cpu_bps, 3),
    }))


if __name__ == "__main__":
    main()
