"""Per-stage timing of the fused MUM pipeline on the current backend."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from libmems_tpu import seeds as seedlib
from libmems_tpu.matchfind import (_mum_seed_flags, _packed_diagonal_words,
                                   _sorted_seed_table, find_mums_device)
from libmems_tpu.sml import SortedMerList
from bench import _synthetic_pair


def t(name, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:38s} {dt*1e3:9.1f} ms", flush=True)
    return out


def main():
    L = 4_600_000
    a, b = _synthetic_pair(L)
    seed = seedlib.get_seed(seedlib.default_seed_weight(L), 0)
    seed_len = seedlib.seed_length(seed)

    smls = [SortedMerList.create(a, seed), SortedMerList.create(b, seed)]
    jax.block_until_ready([s.keys for s in smls])
    keys = jnp.concatenate([s.keys for s in smls])
    n0, n1 = smls[0].n_windows, smls[1].n_windows
    gid = jnp.concatenate([jnp.zeros((n0,), jnp.int32),
                           jnp.ones((n1,), jnp.int32)])
    pos = jnp.concatenate([jnp.arange(n0, dtype=jnp.int32),
                           jnp.arange(n1, dtype=jnp.int32)])
    total = n0 + n1

    st = t("sorted_seed_table (3-key sort)", _sorted_seed_table, keys, gid, pos)
    content, gids, poss, strand = st
    fl = t("mum_seed_flags", lambda *a: _mum_seed_flags(*a, 0, 1000),
           content, gids, poss, strand)
    kept_occ, row_id, ref_strand, n_rows = fl
    print("n_rows:", int(n_rows), flush=True)

    capacity = 1 << max(total // 2, 1).bit_length()
    G = 2

    @jax.jit
    def scatter(kept_occ, row_id, gids, poss, strand, ref_strand):
        rid = jnp.where(kept_occ, jnp.minimum(row_id, capacity), capacity)
        starts = jnp.zeros((capacity + 1, G), dtype=jnp.int32)
        sign = jnp.where(strand == ref_strand, 1, -1).astype(jnp.int32)
        starts = starts.at[rid, gids].set(sign * (poss + 1), mode="drop")
        return starts[:capacity]

    starts = t(f"scatter rows (cap={capacity})", scatter,
               kept_occ, row_id, gids, poss, strand, ref_strand)
    valid = jnp.arange(capacity) < jnp.minimum(n_rows, capacity)
    pos_bits = int(keys.shape[0]).bit_length()

    @jax.jit
    def packed_sort(starts, valid):
        words, posref = _packed_diagonal_words(starts, valid, pos_bits)
        return jax.lax.sort(tuple(words) + (posref,),
                            num_keys=len(words) + 1, is_stable=False)

    t("packed signature sort", packed_sort, starts, valid)

    def e2e():
        out = find_mums_device(smls, extend_capacity=1 << 17, chunk=512)
        return int(out[3])

    e2e()
    t0 = time.perf_counter()
    for _ in range(3):
        e2e()
    dt = (time.perf_counter() - t0) / 3
    print(f"{'fused pipeline e2e':38s} {dt*1e3:9.1f} ms "
          f"-> {2 * L / dt / 1e6:.1f} Mbases/s", flush=True)


if __name__ == "__main__":
    main()
