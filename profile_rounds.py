"""Count extension while-loop rounds per block on real candidate data."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from libmems_tpu import seeds as seedlib
from libmems_tpu.matchfind import (_mum_seed_flags, _sorted_seed_table,
                                   _cluster_reduce_np)
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

    # single block of 4096 rows, hand-rolled probe loop with round counter
    from libmems_tpu.ops import extend as ext
    chunk = 512
    cap = 4096
    sp = np.zeros((cap, 2), np.int64)
    sp[:min(R0, cap)] = cstarts[:cap]
    present = jnp.asarray(sp != 0)
    lefts0 = jnp.where(present, jnp.abs(jnp.asarray(sp)) - 1, 0
                       ).astype(jnp.int32)
    is_fwd = jnp.asarray(sp > 0)
    lengths0 = jnp.full((cap,), seed_len, jnp.int32)
    cnts = np.array([n0, n1], np.int32)
    offs = np.array([0, n0], np.int32)
    go = jnp.broadcast_to(jnp.asarray(offs), (cap, 2))
    gc = jnp.broadcast_to(jnp.asarray(cnts), (cap, 2))

    # replicate _extend_block internals with a python-level loop
    d = jnp.arange(1, chunk + 1, dtype=jnp.int32)
    ref_idx = jnp.argmax(present, axis=1).astype(jnp.int32)
    fwd_flip = is_fwd.astype(keys.dtype)
    sentinel = jnp.full((chunk,), ~jnp.zeros((), keys.dtype), keys.dtype)
    keys_padded = jnp.concatenate([sentinel, keys, sentinel])

    @jax.jit
    def round_(side, lefts, lengths, active):
        l = lefts[:, None, :]
        ln = lengths[:, None, None]
        dd = d[None, :, None]
        fwd = is_fwd[:, None, :]
        back_q = l - dd
        ahead_q = l + ln - seed_len + dd
        q = jnp.where(fwd, jnp.where(side == 0, back_q, ahead_q),
                      jnp.where(side == 0, ahead_q, back_q))
        cnt = gc[:, None, :]
        valid = (q >= 0) & (q < cnt)
        is_back = jnp.where(side == 0, is_fwd, ~is_fwd)
        back_start = lefts - chunk
        ahead_start = lefts + lengths[:, None] - seed_len + 1
        span_start = jnp.where(is_back, back_start, ahead_start) + go + chunk
        slices = jax.vmap(jax.vmap(
            lambda s: jax.lax.dynamic_slice(keys_padded, (s,), (chunk,))))(
            span_start)
        slices = jnp.where(is_back[:, :, None], slices[:, :, ::-1], slices)
        kk = jnp.transpose(slices, (0, 2, 1)) ^ fwd_flip[:, None, :]
        ref_keys = jnp.take_along_axis(
            kk, jnp.broadcast_to(ref_idx[:, None, None], (cap, chunk, 1)),
            axis=2)
        ok = jnp.where(present[:, None, :], valid & (kk == ref_keys), True)
        match = jnp.all(ok, axis=2) & active[:, None]
        dm = jnp.where(match, d[None, :], 0)
        pm_incl = jax.lax.cummax(dm, axis=1)
        pm_excl = jnp.concatenate(
            [jnp.zeros((cap, 1), jnp.int32), pm_incl[:, :-1]], axis=1)
        bad = match & (d[None, :] - pm_excl > seed_len)
        first_bad = jnp.min(jnp.where(bad, d[None, :], chunk + 1), axis=1)
        reach = jnp.max(
            jnp.where(match & (d[None, :] < first_bad[:, None]),
                      d[None, :], 0), axis=1)
        movers = jnp.where(side == 0, is_fwd, ~is_fwd)
        lefts = jnp.where(movers & present & active[:, None],
                          lefts - reach[:, None], lefts)
        lengths = jnp.where(active, lengths + reach, lengths)
        back_room = lefts
        ahead_room = (gc - 1) - (lefts + lengths[:, None] - seed_len)
        room = jnp.where(is_fwd, jnp.where(side == 0, back_room, ahead_room),
                         jnp.where(side == 0, ahead_room, back_room))
        room = jnp.min(jnp.where(present, room, jnp.int32(2**30)), axis=1)
        active = active & (reach + seed_len > chunk) & (room + reach > chunk)
        return lefts, lengths, active

    for side in (0, 1):
        lefts, lengths = lefts0, lengths0
        active = jnp.any(present, axis=1)
        rounds = 0
        t0 = time.perf_counter()
        while bool(jnp.any(active)):
            lefts, lengths, active = round_(side, lefts, lengths, active)
            rounds += 1
            n_act = int(jnp.sum(active))
            if rounds <= 8 or rounds % 50 == 0:
                print(f"side {side} round {rounds}: active={n_act}",
                      flush=True)
            if rounds > 400:
                break
        print(f"side {side}: {rounds} rounds, "
              f"{time.perf_counter()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
