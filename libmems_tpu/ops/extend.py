"""Batched ungapped maximal extension of match candidates.

TPU-native replacement for MatchFinder::ExtendMatch
(libMems/MatchFinder.h:218-374).  The reference extends one match at a
time with seed-length jumps, unit-step probes, and restarts; the net
semantics (equivalent, and property-tested against the oracle port in
tests/oracle/refimpl.py) is:

    repeatedly jump to the FURTHEST window offset within `seed_len` steps
    at which every member genome's canonical spaced-seed mer is equal with
    consistent strand parity; stop when no window in the next `seed_len`
    offsets matches (or a sequence boundary truncates the probe range).

Here all candidates extend simultaneously: each probe round fetches a
`chunk`-wide window comparison per candidate per side, and the furthest
reachable offset under the gap<=seed_len stepping rule is computed with
vector scans (no per-seed sequential walk).  Left/right extension are
independent (left growth preserves right-side probe coordinates since the
probe anchor is left+length), so the two sides run separately.

TPU performance structure:

* every probe span is CONTIGUOUS in the key table (backward rows scan
  [l-C, l-1], ahead rows [p+1, p+C]), so the fetch is a batched
  `dynamic_slice` block gather, not an elementwise random gather;
* probe tensors are laid out (rows, G, C) — the span axis C rides the
  128-wide vector lanes; a (rows, C, G) layout would put G=2 in the
  minor dimension and waste 98% of the VPU;
* spaced seeds extend straight through isolated substitutions, so
  matches are often tens of kb: after one round at the base chunk the
  surviving (long) candidates escalate to an 8x-wide probe window,
  covering length-L matches in O(L/8C) rounds instead of O(L/C).

Parity trick: with canonical key = (content<<1 | strand_bit), the
reference's per-genome parity (MatchFinder.h:283-289: !bit for forward
rows, bit for reverse rows) makes windows match iff
``key ^ is_forward`` is equal across member genomes.

Rows address genomes through per-row (offset, window-count) tables, so a
row may be a dense G-genome match (MemHash mode) or a compact 2-column
pair (PairwiseMatchFinder mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


ROW_BLOCK = 4096   # rows extended per sequential block (bounds HBM live set)
ESCALATE = 8       # long-match probe window = ESCALATE * chunk


@functools.partial(jax.jit, static_argnums=(1, 2))
def extend_matches(
    keys_concat: jax.Array,      # unsigned[Ntot] canonical keys, all genomes
    seed_len: int,
    chunk: int,
    gen_off: jax.Array,          # int32[R, G] offset of the row's genome g
    gen_cnt: jax.Array,          # int32[R, G] window count of the row's genome g
    lefts: jax.Array,            # int32[R, G] 0-based left ends
    present: jax.Array,          # bool[R, G]
    is_fwd: jax.Array,           # bool[R, G] (column 0 / first present = True)
    lengths: jax.Array,          # int32[R] current match length in columns
):
    """Extend candidates to maximal matches. Returns (lefts, lengths).

    Rows are processed in ROW_BLOCK-sized tiles via `lax.map`: the probe
    tensors are (rows, G, chunk) and at full candidate capacity their
    live set exceeds HBM; a block still exposes ROW_BLOCK*chunk*G
    parallel lanes — far past VPU saturation — while blocks with no
    active rows skip their probe loops entirely."""
    if chunk < seed_len:
        raise ValueError("chunk must be >= seed_len")
    R_all, G = lefts.shape
    if R_all > ROW_BLOCK:
        nb = -(-R_all // ROW_BLOCK)
        pad = nb * ROW_BLOCK - R_all

        def padb(x, fill=0):
            return jnp.concatenate(
                [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]
            ).reshape((nb, ROW_BLOCK) + x.shape[1:])

        def block(args):
            return _extend_block(keys_concat, seed_len, chunk, *args)

        out_l, out_n = jax.lax.map(block, (
            padb(gen_off), padb(gen_cnt, 1), padb(lefts),
            padb(present), padb(is_fwd), padb(lengths)))
        return (out_l.reshape(nb * ROW_BLOCK, G)[:R_all],
                out_n.reshape(nb * ROW_BLOCK)[:R_all])
    return _extend_block(keys_concat, seed_len, chunk, gen_off, gen_cnt,
                         lefts, present, is_fwd, lengths)


def _extend_block(keys_concat, seed_len: int, chunk: int, gen_off, gen_cnt,
                  lefts, present, is_fwd, lengths):
    R, G = lefts.shape
    big = ESCALATE * chunk

    ref_idx = jnp.argmax(present, axis=1).astype(jnp.int32)
    fwd_flip = is_fwd.astype(keys_concat.dtype)  # parity adjustment bit

    # Sentinel-pad the key table by one max-chunk on each side so probe
    # spans never need clamping (sentinel reads are masked by `valid`).
    sentinel = jnp.full((big,), ~jnp.zeros((), keys_concat.dtype),
                        keys_concat.dtype)
    keys_padded = jnp.concatenate([sentinel, keys_concat, sentinel])

    def probe_round(side, C, lefts, lengths, active):
        d = jnp.arange(1, C + 1, dtype=jnp.int32)
        l = lefts[:, :, None]                       # (R, G, 1)
        ln = lengths[:, None, None]                 # (R, 1, 1)
        dd = d[None, None, :]                       # (1, 1, C)
        fwd = is_fwd[:, :, None]
        back_q = l - dd
        ahead_q = l + ln - seed_len + dd
        q = jnp.where(fwd, back_q if side == 0 else ahead_q,
                      ahead_q if side == 0 else back_q)   # (R, G, C)
        cnt = gen_cnt[:, :, None]
        valid = (q >= 0) & (q < cnt)

        # Contiguous span fetch: one dynamic_slice per (row, genome)
        is_back = is_fwd if side == 0 else ~is_fwd  # (R, G)
        back_start = lefts - C
        ahead_start = lefts + lengths[:, None] - seed_len + 1
        span_start = jnp.where(is_back, back_start, ahead_start) \
            + gen_off + big  # +big: sentinel pad offset
        slices = jax.vmap(jax.vmap(
            lambda s: jax.lax.dynamic_slice(keys_padded, (s,), (C,))))(
            span_start)                              # (R, G, C)
        # backward rows: d -> slice[C-d] = reversed[d-1]; ahead: d -> slice[d-1]
        keys = jnp.where(is_back[:, :, None], slices[:, :, ::-1], slices)
        keys = keys ^ fwd_flip[:, :, None]
        ref_keys = jnp.take_along_axis(
            keys, jnp.broadcast_to(ref_idx[:, None, None], (R, 1, C)), axis=1)
        ok = jnp.where(present[:, :, None], valid & (keys == ref_keys), True)
        match = jnp.all(ok, axis=1) & active[:, None]  # (R, C)

        # furthest offset reachable with gaps <= seed_len between matches
        dm = jnp.where(match, d[None, :], 0)
        pm_incl = jax.lax.cummax(dm, axis=1)
        pm_excl = jnp.concatenate(
            [jnp.zeros((R, 1), jnp.int32), pm_incl[:, :-1]], axis=1)
        bad = match & (d[None, :] - pm_excl > seed_len)
        first_bad = jnp.min(jnp.where(bad, d[None, :], C + 1), axis=1)
        reach = jnp.max(
            jnp.where(match & (d[None, :] < first_bad[:, None]), d[None, :], 0),
            axis=1)  # (R,)

        # advance: the side's moving genomes shift left by `reach`
        movers = is_fwd if side == 0 else ~is_fwd
        lefts = jnp.where(movers & present & active[:, None],
                          lefts - reach[:, None], lefts)
        lengths = jnp.where(active, lengths + reach, lengths)

        # boundary headroom after advancing: can the chain continue past C?
        back_room = lefts
        ahead_room = (gen_cnt - 1) - (lefts + lengths[:, None] - seed_len)
        room = jnp.where(is_fwd, back_room if side == 0 else ahead_room,
                         ahead_room if side == 0 else back_room)
        room = jnp.min(jnp.where(present, room, jnp.int32(2**30)), axis=1)
        active = active & (reach + seed_len > C) & (room + reach > C)
        return lefts, lengths, active

    def run_side(side, lefts, lengths):
        active0 = jnp.any(present, axis=1)
        # one round at the base chunk retires the short-match bulk ...
        lefts, lengths, active = probe_round(side, chunk, lefts, lengths,
                                             active0)

        # ... surviving long matches escalate to an 8x window
        def cond(carry):
            _, _, active = carry
            return jnp.any(active)

        def body(carry):
            lefts, lengths, active = carry
            return probe_round(side, big, lefts, lengths, active)

        lefts, lengths, _ = jax.lax.while_loop(
            cond, body, (lefts, lengths, active))
        return lefts, lengths

    lefts, lengths = run_side(0, lefts, lengths)
    lefts, lengths = run_side(1, lefts, lengths)
    return lefts, lengths
