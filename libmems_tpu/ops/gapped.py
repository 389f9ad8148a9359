"""Batched pairwise global alignment with affine gaps (Gotoh DP).

TPU-native replacement for the reference's in-process MUSCLE calls on
inter-anchor gap regions (MuscleInterface::Align / CallMuscleFast,
libMems/MuscleInterface.cpp:428-521,:727-769).  Scoring follows the
reference's defaults: HOXD70 substitution matrix, gap open -400, gap
extend -30 (libMems/SubstitutionMatrix.h:23-35).

Design: one `lax.scan` over rows of the DP matrix; the within-row
horizontal dependency of the gap matrix E is resolved with the max-plus
prefix trick (E[j] = ext*j + cummax_{k<j}(G[k] + open - ext*k)), so each
row is pure vector work over (batch, N) — no sequential inner loop.  A
packed pointer byte per cell feeds a vectorized host traceback.

Alignment content differs from MUSCLE's (different algorithm); anchor
coordinates and XMFA structure are unaffected — parity with the
reference is defined at the anchor framework level (SURVEY.md M4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from libmems_tpu import _jaxconfig  # noqa: F401

# HOXD70 (A,C,G,T), libMems/SubstitutionMatrix.h:23-32
HOXD70 = np.array([
    [91, -114, -31, -123],
    [-114, 100, -125, -31],
    [-31, -125, 100, -114],
    [-123, -31, -114, 91],
], dtype=np.int32)
GAP_OPEN = -400    # SubstitutionMatrix.h:34
GAP_EXTEND = -30   # SubstitutionMatrix.h:35

NEG_INF = np.int32(-(1 << 30))

# pointer byte layout
H_DIAG, H_E, H_F = 0, 1, 2
E_EXT_BIT = 4
F_EXT_BIT = 8


@functools.partial(jax.jit, static_argnums=(4, 5))
def _gotoh_forward(a: jax.Array, b: jax.Array, a_len: jax.Array,
                   b_len: jax.Array, gap_open: int, gap_extend: int):
    """Forward DP.  a: uint8[B, M], b: uint8[B, N] (2-bit codes, padded).

    Returns (score int32[B], pointers uint8[B, M, N+1]).
    """
    B, M = a.shape
    N = b.shape[1]
    sub = jnp.asarray(HOXD70)
    oe = gap_open + gap_extend
    ext = gap_extend

    j_idx = jnp.arange(N + 1, dtype=jnp.int32)
    h0 = jnp.where(j_idx == 0, 0, gap_open + ext * j_idx)
    h0 = jnp.broadcast_to(h0, (B, N + 1)).astype(jnp.int32)
    f0 = jnp.full((B, N + 1), NEG_INF, dtype=jnp.int32)

    b_scores = sub[:, b]                       # [4, B, N]
    ext_j = (ext * j_idx[1:]).astype(jnp.int32)  # [N]

    def row(carry, a_i):
        h_prev, f_prev = carry                 # [B, N+1]
        # vertical gap matrix
        f_open = h_prev + oe
        f_ext = f_prev + ext
        f_row = jnp.maximum(f_open, f_ext)
        f_ext_bit = (f_row == f_ext) & (f_prev > NEG_INF // 2)

        # diagonal candidate
        s = jnp.take_along_axis(
            b_scores, a_i[None, :, None].astype(jnp.int32), axis=0)[0]
        diag = h_prev[:, :-1] + s              # [B, N]

        g = jnp.maximum(diag, f_row[:, 1:])    # non-E candidates, j>=1
        # E via max-plus prefix over k < j:
        #   E[j] = ext*j + max_{k<j}( G'[k] + open - ext*k )
        # where G'[0] = H[i][0] (pure F boundary), G'[k>=1] = g[k]
        g0 = f_row[:, :1]                      # H[i][0] = F[i][0]
        gp = jnp.concatenate([g0, g[:, :-1]], axis=1)  # [B, N] (k=0..N-1)
        w = gp + gap_open - ext * j_idx[None, :-1]
        e_row = ext_j[None, :] + jax.lax.cummax(w, axis=1)   # [B, N]

        h_row_1 = jnp.maximum(g, e_row)
        h_row = jnp.concatenate([g0, h_row_1], axis=1)

        # pointers
        e_ext_bit = jnp.concatenate([
            jnp.zeros((B, 1), bool),
            e_row[:, 1:] == e_row[:, :-1] + ext], axis=1)    # [B, N]
        h_src = jnp.where(
            h_row_1 == diag, H_DIAG,
            jnp.where(h_row_1 == e_row, H_E, H_F)).astype(jnp.uint8)
        # prefer E over F on ties (arbitrary but fixed); diag wins ties
        h_src = jnp.where((h_row_1 == diag), H_DIAG, h_src)
        ptr_j0 = jnp.full((B, 1), H_F, jnp.uint8) \
            | jnp.where(f_ext_bit[:, :1], F_EXT_BIT, 0).astype(jnp.uint8)
        ptr = (h_src
               | jnp.where(e_ext_bit, E_EXT_BIT, 0).astype(jnp.uint8)
               | jnp.where(f_ext_bit[:, 1:], F_EXT_BIT, 0).astype(jnp.uint8))
        ptr_row = jnp.concatenate([ptr_j0, ptr], axis=1)     # [B, N+1]
        h_at_blen = jnp.take_along_axis(h_row, b_len[:, None], axis=1)[:, 0]
        return (h_row, f_row), (ptr_row, h_at_blen)

    (_, _), (ptrs, h_at) = jax.lax.scan(row, (h0, f0), a.T)
    # ptrs: [M, B, N+1] -> [B, M, N+1]; h_at: [M, B]
    ptrs = jnp.transpose(ptrs, (1, 0, 2))
    h0_at = jnp.take_along_axis(h0, b_len[:, None], axis=1)[:, 0]
    h_at = jnp.concatenate([h0_at[None], h_at], axis=0)      # rows 0..M
    score = jnp.take_along_axis(h_at, a_len[None, :], axis=0)[0]
    return score, ptrs


def _traceback(ptrs: np.ndarray, a_len: np.ndarray, b_len: np.ndarray):
    """Vectorized affine traceback.  Returns per-pair boolean gap masks
    (a_gaps, b_gaps) as lists of bool arrays: True = gap column."""
    B, M, _ = ptrs.shape
    out = []
    for k in range(B):
        i, j = int(a_len[k]), int(b_len[k])
        state = 0  # 0=H, 1=E, 2=F
        acols: list[bool] = []   # True = gap in a
        bcols: list[bool] = []   # True = gap in b
        P = ptrs[k]
        while i > 0 or j > 0:
            if i == 0:
                acols.append(True)
                bcols.append(False)
                j -= 1
                continue
            if j == 0:
                acols.append(False)
                bcols.append(True)
                i -= 1
                continue
            byte = int(P[i - 1, j])
            if state == 0:
                state = byte & 3
                if state == 0:
                    acols.append(False)
                    bcols.append(False)
                    i -= 1
                    j -= 1
            elif state == 1:   # E: gap in a, consume b[j]
                acols.append(True)
                bcols.append(False)
                nxt = 1 if (byte & E_EXT_BIT) else 0
                j -= 1
                state = nxt
            else:              # F: gap in b, consume a[i]
                acols.append(False)
                bcols.append(True)
                nxt = 2 if (byte & F_EXT_BIT) else 0
                i -= 1
                state = nxt
        out.append((np.array(acols[::-1], dtype=bool),
                    np.array(bcols[::-1], dtype=bool)))
    return out


def _bucket(n: int, minimum: int = 32) -> int:
    b = minimum
    while b < n:
        b <<= 1
    return b


def align_pairs(pairs: list[tuple[np.ndarray, np.ndarray]],
                gap_open: int = GAP_OPEN, gap_extend: int = GAP_EXTEND
                ) -> list[tuple[np.ndarray, np.ndarray]]:
    """Globally align many (a_codes, b_codes) pairs on device.

    Returns per pair (a_gap_mask, b_gap_mask): boolean arrays over
    alignment columns, True where that row has a gap.  Pairs are bucketed
    by padded length to bound recompilation.
    """
    if not pairs:
        return []
    results: list = [None] * len(pairs)
    buckets: dict[tuple[int, int], list[int]] = {}
    for idx, (a, b) in enumerate(pairs):
        key = (_bucket(len(a)), _bucket(len(b)))
        buckets.setdefault(key, []).append(idx)

    for (M, N), idxs in buckets.items():
        Bpad = _bucket(len(idxs), 8)
        a_arr = np.zeros((Bpad, M), dtype=np.uint8)
        b_arr = np.zeros((Bpad, N), dtype=np.uint8)
        a_len = np.zeros(Bpad, dtype=np.int32)
        b_len = np.zeros(Bpad, dtype=np.int32)
        for row, idx in enumerate(idxs):
            a, b = pairs[idx]
            a_arr[row, :len(a)] = a
            b_arr[row, :len(b)] = b
            a_len[row], b_len[row] = len(a), len(b)
        score, ptrs = _gotoh_forward(
            jnp.asarray(a_arr), jnp.asarray(b_arr), jnp.asarray(a_len),
            jnp.asarray(b_len), gap_open, gap_extend)
        tb = _traceback(np.asarray(ptrs), a_len, b_len)
        for row, idx in enumerate(idxs):
            results[idx] = tb[row]
    return results


def align_score(a: np.ndarray, b: np.ndarray,
                gap_open: int = GAP_OPEN,
                gap_extend: int = GAP_EXTEND) -> int:
    """Score-only global alignment of one pair (for tests)."""
    M, N = _bucket(len(a)), _bucket(len(b))
    a_arr = np.zeros((1, M), np.uint8)
    b_arr = np.zeros((1, N), np.uint8)
    a_arr[0, :len(a)] = a
    b_arr[0, :len(b)] = b
    score, _ = _gotoh_forward(
        jnp.asarray(a_arr), jnp.asarray(b_arr),
        jnp.asarray(np.array([len(a)], np.int32)),
        jnp.asarray(np.array([len(b)], np.int32)), gap_open, gap_extend)
    return int(score[0])
