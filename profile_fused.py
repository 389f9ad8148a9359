"""Stage-split timing of the real fused MUM pipeline (forced host sync)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from libmems_tpu import seeds as seedlib
from libmems_tpu.matchfind import (_mum_seed_flags, _packed_diagonal_words,
                                   _recover_starts, _sorted_seed_table)
from libmems_tpu.ops.extend import extend_matches
from libmems_tpu.sml import SortedMerList
from bench import _synthetic_pair


def _touch(out):
    leaves = jax.tree_util.tree_leaves(out)
    return [np.asarray(l[..., :1] if l.ndim else l) for l in leaves]


def t(name, fn, *args, iters=3):
    out = fn(*args)
    _touch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        _touch(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:9.1f} ms", flush=True)
    return out


def main():
    L = 4_600_000
    a, b = _synthetic_pair(L)
    seed = seedlib.get_seed(seedlib.default_seed_weight(L), 0)
    seed_len = seedlib.seed_length(seed)
    smls = [SortedMerList.create(a, seed), SortedMerList.create(b, seed)]
    _touch([s.keys for s in smls])
    keys = jnp.concatenate([s.keys for s in smls])
    n0, n1 = smls[0].n_windows, smls[1].n_windows
    gid = jnp.concatenate([jnp.zeros((n0,), jnp.int32),
                           jnp.ones((n1,), jnp.int32)])
    pos = jnp.concatenate([jnp.arange(n0, dtype=jnp.int32),
                           jnp.arange(n1, dtype=jnp.int32)])
    total = n0 + n1
    G = 2
    capacity = 1 << max(total // 2, 1).bit_length()
    print("total:", total, "capacity:", capacity)

    st = t("A table sort (4op 3key)", jax.jit(_sorted_seed_table),
           keys, gid, pos)
    content, gids, poss, strand = st
    fl = t("B seed flags", lambda *a_: _mum_seed_flags(*a_, 0, 1000),
           content, gids, poss, strand)
    kept_occ, row_id, ref_strand, n_rows = fl
    print("n_rows:", int(n_rows))

    @jax.jit
    def scatter2d(kept_occ, row_id, gids, poss, strand, ref_strand):
        rid = jnp.where(kept_occ, jnp.minimum(row_id, capacity), capacity)
        starts = jnp.zeros((capacity + 1, G), dtype=jnp.int32)
        sign = jnp.where(strand == ref_strand, 1, -1).astype(jnp.int32)
        starts = starts.at[rid, gids].set(sign * (poss + 1), mode="drop")
        return starts[:capacity]

    starts = t("C row scatter 2D (current)", scatter2d,
               kept_occ, row_id, gids, poss, strand, ref_strand)

    @jax.jit
    def scatter_flat(kept_occ, row_id, gids, poss, strand, ref_strand):
        d = jnp.where(kept_occ, row_id * G + gids, capacity * G)
        buf = jnp.zeros((capacity * G + 1,), dtype=jnp.int32)
        sign = jnp.where(strand == ref_strand, 1, -1).astype(jnp.int32)
        buf = buf.at[d].set(sign * (poss + 1), mode="drop")
        return buf[:capacity * G].reshape(capacity, G)

    starts2 = t("C' row scatter flat 1D", scatter_flat,
                kept_occ, row_id, gids, poss, strand, ref_strand)
    print("scatter parity:", bool(jnp.array_equal(starts, starts2)))

    valid = jnp.arange(capacity) < jnp.minimum(n_rows, capacity)
    pos_bits = int(keys.shape[0]).bit_length()

    sigw = t("D signature pack", jax.jit(
        lambda s, v: _packed_diagonal_words(s, v, pos_bits)), starts, valid)
    words, posref = sigw
    n_words = len(words)
    print("sig words:", n_words)

    s = t("E signature sort", jax.jit(
        lambda *ops: jax.lax.sort(ops, num_keys=n_words + 1,
                                  is_stable=False)), *words, posref)

    @jax.jit
    def reps_and_compact(*ops):
        s_words, s_posref_w = ops[:n_words], ops[n_words]
        s_starts = _recover_starts(list(s_words), s_posref_w, G, pos_bits)
        s_posref = s_posref_w.astype(jnp.int64)
        s_valid_rows = jnp.any(s_starts != 0, axis=1)
        wc = jnp.zeros((capacity - 1,), bool)
        for w in s_words:
            wc = wc | (w[1:] != w[:-1])
        sig_change = jnp.concatenate([
            jnp.ones((1,), bool),
            wc | (s_posref[1:] - s_posref[:-1] > seed_len)])
        rep = sig_change & s_valid_rows
        idx_bits = (capacity - 1).bit_length()
        comp_key = ((~rep).astype(jnp.uint64) << jnp.uint64(idx_bits)) \
            | jnp.arange(capacity, dtype=jnp.uint64)
        payload = []
        for g0 in range(0, G, 2):
            hi = s_starts[:, g0].astype(jnp.uint32).astype(jnp.uint64)
            lo = (s_starts[:, g0 + 1].astype(jnp.uint32).astype(jnp.uint64)
                  if g0 + 1 < G else jnp.zeros((capacity,), jnp.uint64))
            payload.append((hi << jnp.uint64(32)) | lo)
        comp = jax.lax.sort((comp_key,) + tuple(payload),
                            num_keys=1, is_stable=False)
        return comp, jnp.sum(rep.astype(jnp.int32))

    comp_out = t("F recover+rep+compact sort", reps_and_compact, *s)
    comp, n_reps = comp_out
    print("n_reps:", int(n_reps))

    extend_capacity = 1 << 17
    e_cols = []
    for g in range(G):
        w = comp[1 + g // 2]
        half = (w >> jnp.uint64(32)) if g % 2 == 0 else \
            (w & jnp.uint64(0xFFFFFFFF))
        e_cols.append(half.astype(jnp.uint32).astype(jnp.int32))
    e_starts = jnp.stack(e_cols, axis=1)[:extend_capacity]
    e_valid = jnp.arange(extend_capacity) < jnp.minimum(n_reps,
                                                        extend_capacity)
    present = (e_starts != 0) & e_valid[:, None]
    lefts = jnp.where(present, jnp.abs(e_starts) - 1, 0)
    is_fwd = e_starts > 0
    lengths0 = jnp.full((extend_capacity,), seed_len, dtype=jnp.int32)
    cnts = np.array([n0, n1], np.int32)
    offs = np.array([0, n0], np.int32)
    gen_off = jnp.broadcast_to(jnp.asarray(offs), (extend_capacity, G))
    gen_cnt = jnp.broadcast_to(jnp.asarray(cnts), (extend_capacity, G))
    chunk = max(seed_len, 128)

    t("G batched extension", jax.jit(
        lambda *a_: extend_matches(a_[0], seed_len, chunk, *a_[1:])),
      keys, gen_off, gen_cnt, lefts, present, is_fwd, lengths0)

    @jax.jit
    def dedup(out_starts, lengths, e_valid):
        sort_ops = tuple(out_starts[:, g] for g in range(G)) + (
            lengths, (~e_valid).astype(jnp.int32))
        return jax.lax.sort(sort_ops, num_keys=G + 2, is_stable=False)
    t("H final dedup sort (131k)", dedup,
      e_starts, lengths0, e_valid)


if __name__ == "__main__":
    main()
