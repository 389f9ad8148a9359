"""Time ONE probe round and its component ops in isolation."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def t(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
    return out


def main():
    R, G, C = 4096, 2, 512
    N = 1 << 23
    seed_len = 24
    rng = np.random.default_rng(0)
    keys_padded = jnp.asarray(rng.integers(0, 1 << 30, N, dtype=np.uint32))
    lefts = jnp.asarray(rng.integers(C, N // 2 - C, (R, G), dtype=np.int32))
    lengths = jnp.full((R,), seed_len, jnp.int32)
    present = jnp.ones((R, G), bool)
    is_fwd = jnp.asarray(rng.integers(0, 2, (R, G)) == 1)
    gen_off = jnp.zeros((R, G), jnp.int32)
    gen_cnt = jnp.full((R, G), N // 2, jnp.int32)
    active = jnp.ones((R,), bool)
    ref_idx = jnp.zeros((R,), jnp.int32)
    fwd_flip = is_fwd.astype(keys_padded.dtype)
    d = jnp.arange(1, C + 1, dtype=jnp.int32)

    @jax.jit
    def fetch(lefts, lengths):
        is_back = is_fwd
        back_start = lefts - C
        ahead_start = lefts + lengths[:, None] - seed_len + 1
        span_start = jnp.where(is_back, back_start, ahead_start) + gen_off + C
        slices = jax.vmap(jax.vmap(
            lambda s: jax.lax.dynamic_slice(keys_padded, (s,), (C,))))(
            span_start)
        keys = jnp.where(is_back[:, :, None], slices[:, :, ::-1], slices)
        return keys ^ fwd_flip[:, :, None]

    keys = t("fetch (slices+reverse+xor)", fetch, lefts, lengths)

    @jax.jit
    def compare(keys, lefts, lengths):
        l = lefts[:, :, None]
        ln = lengths[:, None, None]
        dd = d[None, None, :]
        q = jnp.where(is_fwd[:, :, None], l - dd, l + ln - seed_len + dd)
        valid = (q >= 0) & (q < gen_cnt[:, :, None])
        ref_keys = jnp.take_along_axis(
            keys, jnp.broadcast_to(ref_idx[:, None, None], (R, 1, C)), axis=1)
        ok = jnp.where(present[:, :, None], valid & (keys == ref_keys), True)
        return jnp.all(ok, axis=1) & active[:, None]

    match = t("compare (valid&eq&all)", compare, keys, lefts, lengths)

    @jax.jit
    def reach_scan(match):
        dm = jnp.where(match, d[None, :], 0)
        pm_incl = jax.lax.cummax(dm, axis=1)
        pm_excl = jnp.concatenate(
            [jnp.zeros((R, 1), jnp.int32), pm_incl[:, :-1]], axis=1)
        bad = match & (d[None, :] - pm_excl > seed_len)
        first_bad = jnp.min(jnp.where(bad, d[None, :], C + 1), axis=1)
        return jnp.max(
            jnp.where(match & (d[None, :] < first_bad[:, None]), d[None, :], 0),
            axis=1)

    t("reach (cummax along lanes)", reach_scan, match)

    @jax.jit
    def cummax_lane(x):
        return jax.lax.cummax(x, axis=1)

    @jax.jit
    def cummax_sublane(x):
        return jax.lax.cummax(x, axis=0)

    x = jnp.asarray(rng.integers(0, 1000, (R, C), dtype=np.int32))
    t("bare cummax axis=1 (lanes)", cummax_lane, x)
    t("bare cummax axis=0 (sublanes)", cummax_sublane, x.T.reshape(C, R))

    # full round fused
    @jax.jit
    def full_round(lefts, lengths, active):
        keys = fetch(lefts, lengths)
        match = compare(keys, lefts, lengths)
        reach = reach_scan(match)
        lefts2 = jnp.where(is_fwd & present & active[:, None],
                           lefts - reach[:, None], lefts)
        lengths2 = jnp.where(active, lengths + reach, lengths)
        return lefts2, lengths2

    t("full round (fused, no loop)", full_round, lefts, lengths, active)

    # while_loop of 31 trivial iterations (dispatch test)
    @jax.jit
    def loop31(x):
        def body(c):
            i, x = c
            return i + 1, x * 1.000001
        _, x = jax.lax.while_loop(lambda c: c[0] < 31, body, (0, x))
        return x

    t("while_loop 31 trivial iters (R,C) f32",
      loop31, x.astype(jnp.float32))


if __name__ == "__main__":
    main()
