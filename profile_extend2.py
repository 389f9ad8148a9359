"""Honest (readback-forced) extension timing across configurations."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from libmems_tpu import seeds as seedlib
from libmems_tpu.matchfind import (_mum_seed_flags, _sorted_seed_table,
                                   _cluster_reduce_np)
from libmems_tpu.ops import extend as ext
from libmems_tpu.sml import SortedMerList
from bench import _synthetic_pair


def main():
    L = 4_600_000
    a, b = _synthetic_pair(L)
    seed = seedlib.get_seed(seedlib.default_seed_weight(L), 0)
    seed_len = seedlib.seed_length(seed)
    smls = [SortedMerList.create(a, seed), SortedMerList.create(b, seed)]
    keys = jnp.concatenate([s.keys for s in smls])
    n0, n1 = smls[0].n_windows, smls[1].n_windows
    gid = jnp.concatenate([jnp.zeros((n0,), jnp.int32),
                           jnp.ones((n1,), jnp.int32)])
    pos = jnp.concatenate([jnp.arange(n0, dtype=jnp.int32),
                           jnp.arange(n1, dtype=jnp.int32)])
    content, gids, poss, strand = _sorted_seed_table(keys, gid, pos)
    kept_occ, row_id, ref_strand, n_rows = _mum_seed_flags(
        content, gids, poss, strand, 0, 1000)
    n_rows = int(n_rows)
    kept = np.asarray(kept_occ)
    rid = np.asarray(row_id)[kept]
    g = np.asarray(gids)[kept]
    p = np.asarray(poss)[kept].astype(np.int64)
    st = np.asarray(strand)[kept]
    rst = np.asarray(ref_strand)[kept]
    starts = np.zeros((n_rows, 2), dtype=np.int64)
    starts[rid, g] = np.where(st == rst, 1, -1) * (p + 1)
    cstarts, _ = _cluster_reduce_np(
        starts, np.full(n_rows, seed_len, np.int64), seed_len)
    R0 = len(cstarts)
    print("reps:", R0, flush=True)
    cnts = np.array([n0, n1], np.int32)
    offs = np.array([0, n0], np.int32)

    def run(cap, chunk, row_block, escalate):
        ext.ROW_BLOCK = row_block
        ext.ESCALATE = escalate
        jax.clear_caches()
        sp = np.zeros((cap, 2), np.int64)
        sp[:min(R0, cap)] = cstarts[:cap]
        present = jnp.asarray(sp != 0)
        lefts = jnp.where(present, jnp.abs(jnp.asarray(sp)) - 1, 0
                          ).astype(jnp.int32)
        is_fwd = jnp.asarray(sp > 0)
        lengths = jnp.full((cap,), seed_len, jnp.int32)
        go = jnp.broadcast_to(jnp.asarray(offs), (cap, 2))
        gc = jnp.broadcast_to(jnp.asarray(cnts), (cap, 2))

        def call():
            ol, on = ext.extend_matches(keys, seed_len, chunk, go, gc,
                                        lefts, present, is_fwd, lengths)
            return int(jnp.sum(on.astype(jnp.int64)))  # forced readback

        tot = call()
        t0 = time.perf_counter()
        for _ in range(3):
            call()
        dt = (time.perf_counter() - t0) / 3
        print(f"cap={cap} chunk={chunk} block={row_block} esc={escalate}: "
              f"{dt*1e3:8.1f} ms   (total_len={tot})", flush=True)

    for mode in ("rows", "slice"):
        ext.FETCH = mode
        print("fetch mode:", mode, flush=True)
        run(1 << 12, 512, 1 << 12, 1)
        run(1 << 12, 2048, 1 << 12, 1)
        run(1 << 12, 4096, 1 << 12, 1)
        run(1 << 12, 512, 1 << 12, 8)


if __name__ == "__main__":
    main()
