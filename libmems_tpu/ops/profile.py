"""Batched profile-profile global alignment with affine gaps.

The compute core of the TPU-native MSA engine (libmems_tpu.msa) that
replaces the reference's in-process libMUSCLE profile alignment
(MuscleInterface::ProfileAlignFast, libMems/MuscleInterface.cpp:1053;
CallMuscleFast :727-769).  A profile is a column distribution over the
5-letter alphabet (A,C,G,T,gap); the substitution score between profile
columns is the expected HOXD70 pair score

    S(i, j) = p_i^T · W · q_j

computed as one matmul per DP row (MXU work), with gap-open/extend costs
scaled by the partner column's non-gap occupancy (a standard profile-SP
approximation of MUSCLE's scoring; alignment *content* parity with
MUSCLE is not a goal — anchor-framework parity is, SURVEY.md M4).

The DP is the same max-plus-prefix Gotoh recurrence as
libmems_tpu.ops.gapped: one `lax.scan` over rows, the within-row E
dependency resolved with a cummax, packed pointer bytes for a host
traceback.  All pairs in a batch run in lockstep over padded shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from libmems_tpu import _jaxconfig  # noqa: F401
from libmems_tpu.ops.gapped import (E_EXT_BIT, F_EXT_BIT, GAP_EXTEND,
                                    GAP_OPEN, H_DIAG, H_E, H_F, HOXD70)

GAP_CODE = 4

# 5x5 expected-score matrix: HOXD70 over ACGT; a gap in an input profile
# column contributes 0 to the cross term (gap-vs-gap and gap-vs-base cost
# is carried by the affine gap machinery, not the substitution score).
W5 = np.zeros((5, 5), dtype=np.float32)
W5[:4, :4] = HOXD70.astype(np.float32)

NEG_BIG = np.float32(-1e30)


@functools.partial(jax.jit, static_argnums=(4, 5))
def profile_gotoh_forward(p: jax.Array, q: jax.Array, p_len: jax.Array,
                          q_len: jax.Array, gap_open: int, gap_extend: int):
    """Forward profile DP.

    p: float32[B, M, 5], q: float32[B, N, 5] — column distributions
    (rows beyond p_len/q_len are padding and must be all-zero).
    Returns (score float32[B], pointers uint8[B, M, N+1]).
    """
    B, M, _ = p.shape
    N = q.shape[1]
    w = jnp.asarray(W5)

    # occupancy (non-gap fraction) scales gap penalties: opening a gap
    # against a mostly-gap column is nearly free (profile-SP standard).
    # occupancy scaling: the extend cost of consuming a column is scaled
    # by that column's non-gap fraction (extending through a mostly-gap
    # region is cheap); the open cost stays unscaled.
    p_occ = 1.0 - p[:, :, GAP_CODE]                 # [B, M]
    q_occ = 1.0 - q[:, :, GAP_CODE]                 # [B, N]
    ext_q = gap_extend * q_occ                      # gap in p consumes q col
    ext_p = gap_extend * p_occ                      # gap in q consumes p col

    qw = jnp.einsum("bnx,yx->bny", q, w)            # [B, N, 5]

    j_idx = jnp.arange(N + 1, dtype=jnp.int32)
    ext_cum = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.float32), jnp.cumsum(ext_q, axis=1)], axis=1)
    h0 = jnp.where(j_idx[None, :] == 0, 0.0, gap_open + ext_cum)
    f0 = jnp.full((B, N + 1), NEG_BIG, dtype=jnp.float32)

    def row(carry, xs):
        h_prev, f_prev = carry                       # [B, N+1]
        p_i, ext_pi = xs                             # [B, 5], [B]
        # vertical gap (gap in q, consume p row i)
        f_open = h_prev + gap_open + ext_pi[:, None]
        f_ext = f_prev + ext_pi[:, None]
        f_row = jnp.maximum(f_open, f_ext)
        f_ext_bit = (f_row == f_ext) & (f_prev > NEG_BIG / 2)

        s = jnp.einsum("bx,bnx->bn", p_i, qw)        # [B, N]
        diag = h_prev[:, :-1] + s

        g = jnp.maximum(diag, f_row[:, 1:])
        g0 = f_row[:, :1]
        gp = jnp.concatenate([g0, g[:, :-1]], axis=1)  # k = 0..N-1
        # E[j] = ext_cum[j] + max_{k<j}(G'[k] + open - ext_cum[k])
        wk = gp + gap_open - ext_cum[:, :-1]
        e_row = ext_cum[:, 1:] + jax.lax.cummax(wk, axis=1)

        h_row_1 = jnp.maximum(g, e_row)
        h_row = jnp.concatenate([g0, h_row_1], axis=1)

        e_ext_bit = jnp.concatenate([
            jnp.zeros((B, 1), bool),
            e_row[:, 1:] == e_row[:, :-1] + ext_q[:, 1:]], axis=1)
        h_src = jnp.where(h_row_1 == diag, H_DIAG,
                          jnp.where(h_row_1 == e_row, H_E, H_F)
                          ).astype(jnp.uint8)
        ptr_j0 = jnp.full((B, 1), H_F, jnp.uint8) \
            | jnp.where(f_ext_bit[:, :1], F_EXT_BIT, 0).astype(jnp.uint8)
        ptr = (h_src
               | jnp.where(e_ext_bit, E_EXT_BIT, 0).astype(jnp.uint8)
               | jnp.where(f_ext_bit[:, 1:], F_EXT_BIT, 0).astype(jnp.uint8))
        ptr_row = jnp.concatenate([ptr_j0, ptr], axis=1)
        h_at = jnp.take_along_axis(h_row, q_len[:, None], axis=1)[:, 0]
        return (h_row, f_row), (ptr_row, h_at)

    xs = (jnp.transpose(p, (1, 0, 2)), ext_p.T)
    (_, _), (ptrs, h_at) = jax.lax.scan(row, (h0, f0), xs)
    ptrs = jnp.transpose(ptrs, (1, 0, 2))
    h0_at = jnp.take_along_axis(h0, q_len[:, None], axis=1)[:, 0]
    h_at = jnp.concatenate([h0_at[None], h_at], axis=0)
    score = jnp.take_along_axis(h_at, p_len[None, :], axis=0)[0]
    return score, ptrs


def traceback_profiles(ptrs: np.ndarray, p_len: np.ndarray,
                       q_len: np.ndarray):
    """Per-pair (p_gaps, q_gaps) boolean gap-mask arrays over alignment
    columns (True = that side takes a gap column)."""
    B = ptrs.shape[0]
    out = []
    for k in range(B):
        i, j = int(p_len[k]), int(q_len[k])
        state = 0
        pcols: list[bool] = []
        qcols: list[bool] = []
        P = ptrs[k]
        while i > 0 or j > 0:
            if i == 0:
                pcols.append(True)
                qcols.append(False)
                j -= 1
                continue
            if j == 0:
                pcols.append(False)
                qcols.append(True)
                i -= 1
                continue
            byte = int(P[i - 1, j])
            if state == 0:
                state = byte & 3
                if state == 0:
                    pcols.append(False)
                    qcols.append(False)
                    i -= 1
                    j -= 1
            elif state == 1:   # E: gap in p, consume q column
                pcols.append(True)
                qcols.append(False)
                state = 1 if (byte & E_EXT_BIT) else 0
                j -= 1
            else:              # F: gap in q, consume p column
                pcols.append(False)
                qcols.append(True)
                state = 2 if (byte & F_EXT_BIT) else 0
                i -= 1
        out.append((np.array(pcols[::-1], dtype=bool),
                    np.array(qcols[::-1], dtype=bool)))
    return out


def rows_to_profile(rows: np.ndarray) -> np.ndarray:
    """Alignment rows (uint8 codes, GAP_CODE=4) -> column distribution
    float32[C, 5]."""
    n_rows, C = rows.shape
    prof = np.zeros((C, 5), dtype=np.float32)
    for a in range(5):
        prof[:, a] = (rows == a).sum(axis=0)
    return prof / max(n_rows, 1)


def align_profile_batch(p_rows: list[np.ndarray], q_rows: list[np.ndarray],
                        gap_open: int = GAP_OPEN,
                        gap_extend: int = GAP_EXTEND):
    """Align many (p, q) alignment-row groups on device.

    p_rows[k] / q_rows[k]: uint8[G_k, C_k] code rows (4 = gap).  Returns
    per pair merged rows uint8[Gp_k + Gq_k, C'_k].  Pairs are bucketed by
    padded column count to bound recompilation.
    """
    B = len(p_rows)
    if B == 0:
        return []
    results: list = [None] * B

    def bucket(n, minimum=16):
        b = minimum
        while b < n:
            b <<= 1
        return b

    buckets: dict[tuple[int, int], list[int]] = {}
    for k in range(B):
        key = (bucket(p_rows[k].shape[1]), bucket(q_rows[k].shape[1]))
        buckets.setdefault(key, []).append(k)

    for (M, N), idxs in buckets.items():
        nb = len(idxs)
        nbp = bucket(nb, 4)
        p = np.zeros((nbp, M, 5), dtype=np.float32)
        q = np.zeros((nbp, N, 5), dtype=np.float32)
        p_len = np.zeros(nbp, dtype=np.int32)
        q_len = np.zeros(nbp, dtype=np.int32)
        for r, k in enumerate(idxs):
            cp, cq = p_rows[k].shape[1], q_rows[k].shape[1]
            p[r, :cp] = rows_to_profile(p_rows[k])
            q[r, :cq] = rows_to_profile(q_rows[k])
            p_len[r], q_len[r] = cp, cq
        _, ptrs = profile_gotoh_forward(
            jnp.asarray(p), jnp.asarray(q), jnp.asarray(p_len),
            jnp.asarray(q_len), gap_open, gap_extend)
        tb = traceback_profiles(np.asarray(ptrs), p_len, q_len)
        for r, k in enumerate(idxs):
            p_gaps, q_gaps = tb[r]
            results[k] = merge_rows(p_rows[k], q_rows[k], p_gaps, q_gaps)
    return results


def merge_rows(p_rows: np.ndarray, q_rows: np.ndarray,
               p_gaps: np.ndarray, q_gaps: np.ndarray) -> np.ndarray:
    """Interleave two row groups along the merged column axis given their
    gap masks (True = insert an all-gap column on that side)."""
    C = len(p_gaps)
    Gp, Gq = p_rows.shape[0], q_rows.shape[0]
    out = np.full((Gp + Gq, C), GAP_CODE, dtype=np.uint8)
    out[:Gp, ~p_gaps] = p_rows
    out[Gp:, ~q_gaps] = q_rows
    return out
