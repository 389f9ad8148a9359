"""Measure the primitive sort/scatter/gather costs on the current backend."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def _touch(out):
    """Force materialization on remote backends: fetch one element of
    every output to host."""
    leaves = jax.tree_util.tree_leaves(out)
    return [np.asarray(l[..., :1] if l.ndim else l) for l in leaves]


def t(name, fn, *args, iters=5):
    out = fn(*args)
    _touch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        _touch(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:46s} {dt*1e3:9.1f} ms", flush=True)
    return out


def main():
    N = 9_200_000
    Np2 = 1 << 23  # 8.4M
    rng = np.random.default_rng(0)
    k64 = jnp.asarray(rng.integers(0, 1 << 55, size=N, dtype=np.uint64))
    g32 = jnp.asarray(rng.integers(0, 2, size=N, dtype=np.int32))
    p32 = jnp.asarray(rng.integers(0, N // 2, size=N, dtype=np.int32))
    s8 = jnp.asarray(rng.integers(0, 2, size=N, dtype=np.uint8))

    t("sort 1op u64 (9.2M)", jax.jit(
        lambda k: jax.lax.sort((k,), num_keys=1, is_stable=False)), k64)
    t("sort 2op u64+u64 2key (9.2M)", jax.jit(
        lambda k, p: jax.lax.sort((k, p.astype(jnp.uint64)), num_keys=2,
                                  is_stable=False)), k64, p32)
    t("sort 1key+1payload u64 (9.2M)", jax.jit(
        lambda k, p: jax.lax.sort((k, p), num_keys=1, is_stable=False)),
      k64, p32)
    t("sort 4op 3key (content,gid,pos,strand)", jax.jit(
        lambda k, g, p, s: jax.lax.sort((k, g, p, s), num_keys=3,
                                        is_stable=False)), k64, g32, p32, s8)
    kc = jnp.asarray(rng.integers(0, 1 << 55, size=Np2, dtype=np.uint64))
    pc = jnp.asarray(rng.integers(0, N, size=Np2, dtype=np.uint64))
    t("sort 2op u64 2key (8.4M)", jax.jit(
        lambda k, p: jax.lax.sort((k, p), num_keys=2, is_stable=False)),
      kc, pc)

    # scatter 9.2M (row,col) int32 into (8.4M+1, 2)
    rid = jnp.asarray(rng.integers(0, Np2 + 1, size=N, dtype=np.int32))
    val = p32

    @jax.jit
    def scat(rid, g, v):
        buf = jnp.zeros((Np2 + 1, 2), jnp.int32)
        return buf.at[rid, g].set(v, mode="drop")
    t("scatter 9.2M i32 -> (8.4M,2)", scat, rid, g32, val)

    @jax.jit
    def scat1(rid, v):
        buf = jnp.zeros((Np2 + 1,), jnp.int32)
        return buf.at[rid].set(v, mode="drop")
    t("scatter 9.2M i32 -> (8.4M,)", scat1, rid, val)

    half = jnp.asarray(rng.integers(0, N, size=Np2, dtype=np.int32))

    @jax.jit
    def gath(idx, v):
        return v[idx], v[jnp.minimum(idx + 1, N - 1)]
    t("gather 2x 8.4M i32 from 9.2M", gath, half, val)

    # segmented cumsum-based flags at 9.2M (scan cost reference)
    @jax.jit
    def flags(k):
        sc = jnp.concatenate([jnp.ones((1,), bool), k[1:] != k[:-1]])
        return jnp.cumsum(sc.astype(jnp.int32))
    t("run flags + cumsum (9.2M)", flags, k64)


if __name__ == "__main__":
    main()
