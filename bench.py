"""Benchmark: MUM discovery throughput (bases/s) on the current backend.

Runs the fused device pipeline (packed seed-word sort -> neighbor-compare
run flags -> diagonal-cluster sort -> representative compaction ->
span-seeded batched ungapped extension -> dedup) on a synthetic
E. coli-scale pair (2 x 4.6 Mbp, 1% substitutions + 0.05% indels, the
indels giving the realistic diagonal-breaking structure of a true
genome pair) and prints ONE JSON line.

vs_baseline: ratio against a single-core CPU reference throughput for
the SAME full pipeline (pack, sort, run flags, cluster, compact,
extend, dedup) measured once per run with numpy on a sample (the
reference C++ library publishes no numbers and cannot be built here —
BASELINE.md / tests/golden/README.md; the numpy twin stands in for the
reference's fill+sort+stream-merge+ExtendMatch loops).

A per-stage device-time table is printed to stderr (lines prefixed
'# stage'); stdout carries only the JSON line.
"""

import json
import sys
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


def _cpu_full_pipeline_np(codes_a, codes_b, seed):
    """Single-core numpy twin of the device fast path: identical
    algorithm (pack -> sort -> neighbor flags -> cluster sort -> rep
    compaction -> span-seeded extension -> dedup), so bases/s compares
    the same work on one CPU core vs one TPU chip."""
    from libmems_tpu import seeds as seedlib
    from libmems_tpu.ops.mers import canonical_seed_keys_np

    seed_len = seedlib.seed_length(seed)
    ka = canonical_seed_keys_np(codes_a, seed).astype(np.uint64)
    kb = canonical_seed_keys_np(codes_b, seed).astype(np.uint64)
    na, nb = len(ka), len(kb)
    pb = max(int(max(na, nb)).bit_length(), 8)

    def pack(keys, gid):
        content = keys >> np.uint64(1)
        strand = keys & np.uint64(1)
        pos = np.arange(len(keys), dtype=np.uint64)
        return (content << np.uint64(pb + 2)) \
            | (np.uint64(gid) << np.uint64(pb + 1)) \
            | (pos << np.uint64(1)) | strand

    w = np.sort(np.concatenate([pack(ka, 0), pack(kb, 1)]))
    c = w >> np.uint64(pb + 2)
    gid = (w >> np.uint64(pb + 1)) & np.uint64(1)
    pos = ((w >> np.uint64(1)) & np.uint64((1 << pb) - 1)).astype(np.int64)
    strand = w & np.uint64(1)
    c1 = np.concatenate([c[1:], [~np.uint64(0)]])
    c2 = np.concatenate([c[2:], [~np.uint64(0)] * 2])
    cp = np.concatenate([[~np.uint64(0)], c[:-1]])
    g1 = np.concatenate([gid[1:], [np.uint64(0)]])
    surv = (c == c1) & (c != cp) & (c1 != c2) & (gid == 0) & (g1 == 1)
    posA = pos[surv]
    posB = np.concatenate([pos[1:], [0]])[surv]
    fwd = (strand == np.concatenate([strand[1:], [np.uint64(0)]]))[surv]

    delta = np.where(fwd, posB - posA + (1 << pb), posB + posA)
    order = np.lexsort((posA, delta, ~fwd))
    pA, dl, fw, pB = posA[order], delta[order], fwd[order], posB[order]
    same = np.concatenate([[False], (dl[1:] == dl[:-1])
                           & (fw[1:] == fw[:-1])])
    gap_ok = np.concatenate([[False], pA[1:] - pA[:-1] <= seed_len])
    rep = ~(same & gap_ok)
    rep_idx = np.flatnonzero(rep)
    ends = np.concatenate([rep_idx[1:] - 1, [len(pA) - 1]])
    r_pA, r_pB, r_fw = pA[rep_idx], pB[rep_idx], fw[rep_idx]
    last_pA = pA[ends]
    span = last_pA - r_pA
    lengths = span + seed_len
    leftB = np.where(r_fw, r_pB, dl[rep_idx] - last_pA)

    # span-seeded ungapped extension, same probe rule as the device
    keys_all = [ka, kb]
    cnts = np.array([na, nb])

    def extend_side(lefts, lengths, side):
        R = len(lengths)
        active = np.ones(R, dtype=bool)
        C0 = 4 * seed_len
        C = C0
        while active.any():
            d = np.arange(1, C + 1)
            ai = np.flatnonzero(active)
            matchm = np.ones((len(ai), C), dtype=bool)
            for g in range(2):
                fwd_g = np.ones(len(ai), bool) if g == 0 else r_fw[ai]
                l = lefts[ai, g]
                back_q = l[:, None] - d[None, :]
                ahead_q = l[:, None] + lengths[ai, None] - seed_len \
                    + d[None, :]
                q = np.where(fwd_g[:, None],
                             back_q if side == 0 else ahead_q,
                             ahead_q if side == 0 else back_q)
                validq = (q >= 0) & (q < cnts[g])
                kq = keys_all[g][np.clip(q, 0, cnts[g] - 1)]
                kq = kq ^ fwd_g[:, None].astype(kq.dtype)
                if g == 0:
                    refk = kq
                    refv = validq
                else:
                    matchm &= validq & refv & (kq == refk)
            dm = np.where(matchm, d[None, :], 0)
            pm = np.maximum.accumulate(dm, axis=1)
            pm_excl = np.concatenate(
                [np.zeros((len(ai), 1), np.int64), pm[:, :-1]], axis=1)
            bad = matchm & (d[None, :] - pm_excl > seed_len)
            first_bad = np.where(bad.any(axis=1),
                                 np.argmax(bad, axis=1) + 1, C + 1)
            reach = np.max(np.where(matchm & (d[None, :]
                                              < first_bad[:, None]),
                                    d[None, :], 0), axis=1)
            for g in range(2):
                fwd_g = np.ones(len(ai), bool) if g == 0 else r_fw[ai]
                mv = fwd_g if side == 0 else ~fwd_g
                lefts[ai[mv], g] -= reach[mv]
            lengths[ai] += reach
            active[ai] = reach + seed_len > C
            C = 8 * C0  # survivors are long: escalate the probe window
        return lefts, lengths

    lefts = np.stack([r_pA, leftB], axis=1).astype(np.int64)
    lengths = lengths.astype(np.int64)
    lefts, lengths = extend_side(lefts, lengths, 0)
    lefts, lengths = extend_side(lefts, lengths, 1)
    rows = np.stack([lefts[:, 0] + 1,
                     np.where(r_fw, 1, -1) * (lefts[:, 1] + 1),
                     lengths], axis=1)
    uniq = np.unique(rows, axis=0)
    return uniq


def _cpu_reference_bases_per_s(codes_a, codes_b, seed, sample=1 << 20):
    a = codes_a[:sample]
    b = codes_b[:sample]
    t0 = time.perf_counter()
    _ = _cpu_full_pipeline_np(a, b, seed)
    dt = time.perf_counter() - t0
    return (len(a) + len(b)) / dt


def _stage_table(smls, chunk, ec):
    """Per-stage device times (separately-jitted stages; the fused
    pipeline overlaps some of these, so the table over-counts slightly)."""
    import jax
    import jax.numpy as jnp
    from libmems_tpu import matchfind as mf

    seed_len = smls[0].seed_length
    pb = mf._pair_pos_bits(max(s.n_windows for s in smls))
    u = jnp.uint64

    def timed(name, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf[:1] if leaf.ndim else leaf)
        t0 = time.perf_counter()
        for _i in range(3):
            out = fn(*args)
            jax.block_until_ready(out)
            leaf = jax.tree_util.tree_leaves(out)[0]
            _ = np.asarray(leaf[:1] if leaf.ndim else leaf)
        dt = (time.perf_counter() - t0) / 3
        print(f"# stage {name:28s} {dt * 1000:8.2f} ms", file=sys.stderr)
        return out

    ka, kb = smls[0].keys, smls[1].keys

    @jax.jit
    def s1(ka, kb):
        def pack(keys, gid):
            content = (keys >> 1).astype(u)
            strand = (keys & 1).astype(u)
            pos = jnp.arange(keys.shape[0], dtype=jnp.uint32).astype(u)
            return (content << u(pb + 2)) | (u(gid) << u(pb + 1)) \
                | (pos << u(1)) | strand
        return jax.lax.sort(jnp.concatenate([pack(ka, 0), pack(kb, 1)]))

    w = timed("seed-word sort (9.2M u64)", s1, ka, kb)

    @jax.jit
    def s2(w):
        c = w >> u(pb + 2)
        inf = ~jnp.zeros((1,), c.dtype)
        c1 = jnp.concatenate([c[1:], inf >> u(pb + 2)])
        c2 = jnp.concatenate([c[2:], jnp.broadcast_to(inf >> u(pb + 2), (2,))])
        cp = jnp.concatenate([inf, c[:-1]])
        gid = ((w >> u(pb + 1)) & u(1)).astype(jnp.uint32)
        g1 = jnp.concatenate([gid[1:], jnp.zeros((1,), jnp.uint32)])
        surv = (c == c1) & (c != cp) & (c1 != c2) & (gid == 0) & (g1 == 1)
        return surv

    surv = timed("pair-run flags (neighbors)", s2, w)

    @jax.jit
    def s3(w, surv):
        pos = ((w >> u(1)) & u((1 << pb) - 1)).astype(jnp.int32)
        strand = (w & u(1)).astype(jnp.uint32)
        posA, posB = pos, jnp.concatenate([pos[1:], jnp.zeros((1,), jnp.int32)])
        fwd = strand == jnp.concatenate([strand[1:], jnp.zeros((1,), jnp.uint32)])
        delta_b = jnp.where(fwd, (posB - posA + (1 << pb)).astype(u),
                            (posB + posA).astype(u))
        cw = (fwd.astype(u) << u(2 * pb + 2)) | (delta_b << u(pb)) \
            | posA.astype(u)
        return jax.lax.sort(jnp.where(surv, cw, ~u(0)))

    cw = timed("cluster sort (diag|posA)", s3, w, surv)
    full = lambda: mf.find_mums_device(smls, extend_capacity=ec, chunk=chunk)
    timed("FULL fused pipeline", full)


def main():
    import jax
    from libmems_tpu import seeds as seedlib
    from libmems_tpu.matchfind import find_mums_device
    from libmems_tpu.sml import SortedMerList

    L = 4_600_000
    seed = seedlib.get_seed(15, 0)
    codes_a, codes_b = _synthetic_pair(L)

    cpu_bps = _cpu_reference_bases_per_s(codes_a, codes_b, seed)

    smls = [SortedMerList.create(codes_a, seed),
            SortedMerList.create(codes_b, seed)]

    EC = 1 << 14
    CHUNK = None   # library default: shares the compile-cache entry with
                   # find_mums' production path

    def run(ec):
        starts, lengths, valid, n_rows, n_reps = find_mums_device(
            smls, extend_capacity=ec, chunk=CHUNK)
        # fetch a value: on remote-TPU backends block_until_ready alone
        # does not guarantee execution finished
        return int(n_rows), int(n_reps)

    n_rows, n_reps = run(EC)  # compile + warm
    while n_reps > EC:        # capacity overflow: retry bigger
        EC <<= 2
        n_rows, n_reps = run(EC)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        run(EC)
    dt = (time.perf_counter() - t0) / iters

    bases = 2 * L
    bps = bases / dt
    if "--stages" in sys.argv:
        _stage_table(smls, CHUNK, EC)
    print(f"# device {dt * 1000:.1f} ms/iter, n_reps={n_reps}, "
          f"cpu twin {cpu_bps / 1e6:.2f} Mbases/s", file=sys.stderr)
    print(json.dumps({
        "metric": "mum_find_bases_per_s",
        "value": round(bps, 1),
        "unit": "bases/s",
        "vs_baseline": round(bps / cpu_bps, 3),
    }))


if __name__ == "__main__":
    main()
