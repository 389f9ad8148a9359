"""Two-state homology pair-HMM: batched log-space forward/backward.

TPU-native replacement for the HMMoC-generated HomologyHMM
(libMems/HomologyHMM/homology.{h,cc}, homology.xml, homologymain.cc):
states {homologous, unrelated} over 8 column-class symbols (identity
AT/GC, transversion/transition classes, gap open, gap extend —
parameters.h:24-47).  Where the reference runs one sequence at a time
with a custom extended-exponent float ("bfloat", algebras.h) to dodge
underflow, here whole batches of encoded column sequences run in one
`lax.scan` in log space (log-sum-exp replaces bfloat), and the posterior
threshold (≥ 0.9 ⇒ homologous, homologymain.cc:44-58) is a vector
compare.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from libmems_tpu import _jaxconfig  # noqa: F401

POSTERIOR_THRESHOLD = 0.9   # homologymain.cc:50


@dataclass
class HmmParams:
    """Transition + emission parameters (HomologyHMM Params struct)."""

    start_homologous: float = 0.5
    go_homologous: float = 1e-5          # U -> H
    go_unrelated: float = 1e-7           # H -> U
    go_stop_from_homologous: float = 1e-8
    go_stop_from_unrelated: float = 1e-8
    emit_homologous: np.ndarray = field(default=None)  # float[8]
    emit_unrelated: np.ndarray = field(default=None)


def hoxd_params() -> HmmParams:
    """The Chiaromonte/Miller HOXD-derived defaults
    (parameters.h getHoxdParams, :11-53)."""
    eh = np.zeros(8)
    eh[0] = 0.1723 * 2     # a:a, t:t
    eh[1] = 0.1462 * 2     # c:c, g:g
    eh[2] = 0.0180 * 4     # a:c class (transversion 1)
    eh[3] = 0.0426 * 4     # a:g class (transition)
    eh[4] = 0.0186 * 2     # a:t
    eh[5] = 0.0142 * 2     # g:c
    eh[6] = 0.004461       # gap open
    eh[7] = 1.0 - eh[:7].sum()   # gap extend
    eu = np.zeros(8)
    eu[0] = 0.12818742714404662781015820149872
    eu[1] = 0.10493347210657785179017485428807
    eu[2] = 0.11597910074937552039966694421313
    eu[3] = eu[2]
    eu[4] = eu[0]
    eu[5] = eu[1]
    eu[6] = 0.0483
    eu[7] = 1.0 - eu[:7].sum()
    return HmmParams(go_stop_from_homologous=1e-8,
                     go_stop_from_unrelated=1e-8,
                     emit_homologous=eh, emit_unrelated=eu)


def adapted_hoxd_params(gc_content: float) -> HmmParams:
    """GC-adapted emissions (getAdaptedHoxdMatrixParameters,
    parameters.h:59-137)."""
    at = 1.0 - gc_content
    gO_u, gE_u = 0.0483, 0.2535
    gO_h, gE_h = 0.004461, 0.050733
    eu = np.zeros(8)
    eu[0] = 2 * (at / 2) ** 2
    eu[1] = 2 * (gc_content / 2) ** 2
    eu[2] = 2 * (at / 2) * (gc_content / 2)
    eu[3] = eu[2]
    eu[4] = eu[0]
    eu[5] = eu[1]
    norm = (1 - (gO_u + gE_u)) / eu[:6].sum()
    eu[:6] *= norm
    eu[6] = gO_u
    eu[7] = 1.0 - eu[:7].sum()
    eh = np.zeros(8)
    eh[0] = (at / 0.525) * 0.1723 * 2
    eh[1] = (gc_content / 0.475) * 0.1462 * 2
    eh[2] = 0.0180 * 4
    eh[3] = 0.0426 * 4
    eh[4] = (at / 0.525) * 0.0186 * 2
    eh[5] = (gc_content / 0.475) * 0.0142 * 2
    norm = (1 - (gO_h + gE_h)) / eh[:6].sum()
    eh[:6] *= norm
    eh[6] = gO_h
    eh[7] = 1.0 - eh[:7].sum()
    return HmmParams(go_stop_from_homologous=1e-7,
                     go_stop_from_unrelated=1e-7,
                     emit_homologous=eh, emit_unrelated=eu)


def adapt_to_percent_identity(params: HmmParams,
                              pct_identity: float) -> HmmParams:
    """Shift homologous identity emission mass to match an expected
    percent identity (adaptToPercentIdentity, parameters.h:140-159)."""
    if not (0 < pct_identity <= 1):
        raise ValueError("bad pct identity")
    eh = params.emit_homologous.copy()
    gapnorm = pct_identity * (1.0 - eh[6] - eh[7])
    prev = eh[0] + eh[1]
    diff = prev - gapnorm
    rest = eh[2] + eh[3] + eh[4] + eh[5]
    eh[2:6] += diff * eh[2:6] / rest
    eh[0] -= diff * eh[0] / prev
    eh[1] -= diff * eh[1] / prev
    out = HmmParams(**{**params.__dict__})
    out.emit_homologous = eh
    return out


def _log_matrices(params: HmmParams):
    """(log_start[2], log_T[2,2], log_stop[2], log_emit[2,8]) with state
    order (H, U)."""
    lt = np.log(np.array([
        [1.0 - params.go_unrelated - params.go_stop_from_homologous,
         params.go_unrelated],
        [params.go_homologous,
         1.0 - params.go_homologous - params.go_stop_from_unrelated],
    ]))
    ls = np.log(np.array([params.start_homologous,
                          1.0 - params.start_homologous]))
    lstop = np.log(np.array([params.go_stop_from_homologous,
                             params.go_stop_from_unrelated]))
    le = np.log(np.stack([params.emit_homologous,
                          params.emit_unrelated]))
    return ls, lt, lstop, le


@functools.partial(jax.jit, static_argnums=())
def _fb_posterior(obs: jax.Array, lengths: jax.Array, ls, lt, lstop, le):
    """obs: int32[B, T] symbol codes 0..7 (padding arbitrary);
    lengths: int32[B].  Returns posterior P(H) float32[B, T]."""
    B, T = obs.shape
    le_obs = le.T[obs]                    # [B, T, 2] log emit per state
    idx = jnp.arange(T)

    def fstep(f_prev, x):
        le_i, i = x
        f = jax.nn.logsumexp(f_prev[:, :, None] + lt[None], axis=1) + le_i
        f = jnp.where((i < lengths)[:, None], f, f_prev)
        return f, f

    f0 = ls[None] + le_obs[:, 0]
    _, F = jax.lax.scan(fstep, f0,
                        (jnp.moveaxis(le_obs[:, 1:], 1, 0), idx[1:]))
    F = jnp.concatenate([f0[None], F], axis=0)      # [T, B, 2]

    def bstep(b_next, x):
        le_next, i = x
        b = jax.nn.logsumexp(
            lt[None] + (le_next + b_next)[:, None, :], axis=2)
        # positions at the end boundary take the stop vector
        b = jnp.where((i == lengths - 1)[:, None], lstop[None], b)
        b = jnp.where((i > lengths - 1)[:, None], b_next, b)
        return b, b

    bT = jnp.broadcast_to(lstop[None], (B, 2))
    _, Bk = jax.lax.scan(bstep, bT,
                         (jnp.moveaxis(le_obs[:, 1:], 1, 0), idx[:-1]),
                         reverse=True)
    Bk = jnp.concatenate([Bk, bT[None]], axis=0)    # [T, B, 2]

    last = jnp.take_along_axis(
        F, (lengths - 1)[None, :, None].astype(jnp.int32), axis=0)[0]
    logP = jax.nn.logsumexp(last + lstop[None], axis=1)    # [B]
    post_h = jnp.exp(F[:, :, 0] + Bk[:, :, 0] - logP[None, :])
    return jnp.moveaxis(post_h, 0, 1)               # [B, T]


def posterior_homologous(sequences: list[np.ndarray],
                         params: HmmParams | None = None) -> list[np.ndarray]:
    """Posterior P(homologous) per column for a batch of encoded symbol
    sequences (uint8 codes 0..7).  Batched, padded to buckets."""
    if params is None:
        params = hoxd_params()
    ls, lt, lstop, le = (jnp.asarray(x) for x in _log_matrices(params))
    out: list = [None] * len(sequences)
    buckets: dict[int, list[int]] = {}
    for i, s in enumerate(sequences):
        if len(s) == 0:
            out[i] = np.zeros(0, dtype=np.float32)
            continue
        T = max(64, 1 << (len(s) - 1).bit_length())
        buckets.setdefault(T, []).append(i)
    for T, idxs in buckets.items():
        Bp = max(1, 1 << (len(idxs) - 1).bit_length())
        obs = np.zeros((Bp, T), dtype=np.int32)
        lens = np.ones(Bp, dtype=np.int32)
        for r, i in enumerate(idxs):
            obs[r, :len(sequences[i])] = sequences[i]
            lens[r] = len(sequences[i])
        post = np.asarray(_fb_posterior(jnp.asarray(obs),
                                        jnp.asarray(lens),
                                        ls, lt, lstop, le))
        for r, i in enumerate(idxs):
            out[i] = post[r, :len(sequences[i])]
    return out


def predict_homologous(sequences: list[np.ndarray],
                       params: HmmParams | None = None,
                       threshold: float = POSTERIOR_THRESHOLD
                       ) -> list[np.ndarray]:
    """Boolean per-column homology calls (run() equivalent)."""
    return [p >= threshold
            for p in posterior_homologous(sequences, params)]
