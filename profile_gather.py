"""Honest microbenchmark (scalar readback) of batched span-gather strategies."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def t(name, fn, *args, iters=5):
    out = int(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = int(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:46s} {dt*1e3:9.2f} ms   ({out & 0xFFFF})", flush=True)


def main():
    N = 1 << 23
    R, G, C = 4096, 2, 512
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 1 << 30, N, dtype=np.uint32))
    starts = jnp.asarray(rng.integers(0, N - 2 * C, (R, G), dtype=np.int32))
    NROWS = C // 128 + 1

    @jax.jit
    def elementwise(keys, starts):
        q = starts[:, :, None] + jnp.arange(C, dtype=jnp.int32)
        return keys[q].astype(jnp.uint64).sum()

    @jax.jit
    def vmap_slice(keys, starts):
        s = jax.vmap(jax.vmap(
            lambda s: jax.lax.dynamic_slice(keys, (s,), (C,))))(starts)
        return s.astype(jnp.uint64).sum()

    @jax.jit
    def row_gather(keys, starts):
        k2 = keys.reshape(-1, 128)
        rb = starts // 128
        rows_idx = rb[:, :, None] + jnp.arange(NROWS, dtype=jnp.int32)
        rows = k2[rows_idx]                      # (R, G, NROWS, 128)
        return rows.astype(jnp.uint64).sum()     # (no shift; raw fetch rate)

    @jax.jit
    def row_gather_shift(keys, starts):
        k2 = keys.reshape(-1, 128)
        rb = starts // 128
        s = (starts % 128).astype(jnp.int32)
        rows_idx = rb[:, :, None] + jnp.arange(NROWS, dtype=jnp.int32)
        rows = k2[rows_idx]
        v = rows.reshape(R, G, NROWS * 128)
        for k in range(7):
            bit = ((s >> k) & 1) == 1
            v = jnp.where(bit[:, :, None], jnp.roll(v, -(1 << k), axis=2), v)
        return v[:, :, :C].astype(jnp.uint64).sum()

    @jax.jit
    def take_rows(keys, starts):
        k2 = keys.reshape(-1, 128)
        rb = (starts // 128).reshape(-1)
        rows_idx = (rb[:, None] + jnp.arange(NROWS, dtype=jnp.int32)).reshape(-1)
        rows = jnp.take(k2, rows_idx, axis=0)
        return rows.astype(jnp.uint64).sum()

    t("elementwise gather", elementwise, keys, starts)
    t("vmap dynamic_slice", vmap_slice, keys, starts)
    t("2d row gather (raw)", row_gather, keys, starts)
    t("2d row gather + barrel shift", row_gather_shift, keys, starts)
    t("jnp.take rows (flat)", take_rows, keys, starts)

    mb = R * G * C * 4 / 1e6
    print(f"span payload: {mb:.0f} MB (x{NROWS * 128 / C:.2f} for row gather)")


if __name__ == "__main__":
    main()
