"""Loop-faithful L5 oracle: reference HomologyHMM column encoding and
forward/backward posterior decoding.

TEST-ONLY scaffolding (like refimpl.py / refimpl_l4.py): a direct port
of the reference's semantics used to property-test the batched device
implementations — never imported by libmems_tpu/.

Ported behaviors:

* charmap / colmap column encoding + gap-open -> gap-extend rewrite +
  gap/gap removal (libMems/Islands.h:90-160: the SEQUENTIAL rewrite
  where s[colI-2]=='8' refers to already-rewritten symbols);
* the 2-state homology HMM topology (HomologyHMM/homology.xml:88-97:
  emission on entering a state; stayH = 1-goUnrelated-goStopFromH,
  stayU = 1-goHomologous-goStopFromU; end transitions weighted by the
  stop probabilities);
* Forward/Backward with bfloat-equivalent arithmetic — the reference's
  extended-exponent float (HomologyHMM/algebras.h) is emulated by
  (mantissa, base-2 exponent) renormalized doubles, so no underflow at
  any sequence length;
* posterior = F(H,i) * B(H,i) / P(seq), called homologous iff >= 0.9
  (homologymain.cc:44-58);
* HSS harvest of maximal 'H' runs mapped through col_reference
  (Islands.h:168-196).
"""

from __future__ import annotations

import math

import numpy as np

CHARMAP = np.zeros(256, dtype=np.uint8)      # everything else -> 'A' row
for _c, _v in (("a", 0), ("c", 1), ("g", 2), ("t", 3), ("-", 4),
               ("A", 0), ("C", 1), ("G", 2), ("T", 3)):
    CHARMAP[ord(_c)] = _v

# colmap (Islands.h:113-120), ASCII symbols '1'..'8'; 0 = gap/gap (drop)
COLMAP = [
    ["1", "3", "4", "5", "7"],
    ["3", "2", "6", "4", "7"],
    ["4", "6", "2", "3", "7"],
    ["5", "4", "3", "1", "7"],
    ["7", "7", "7", "7", "\0"],
]


def encode_columns(row_i: np.ndarray, row_j: np.ndarray
                   ) -> tuple[str, list[int]]:
    """The reference's encoding loop: returns (column_states string of
    '1'..'8', col_reference) after gap/gap removal and the sequential
    gap-open -> gap-extend rewrite."""
    states = []
    col_reference = []
    for colI in range(len(row_i)):
        a = CHARMAP[row_i[colI]]
        b = CHARMAP[row_j[colI]]
        c = COLMAP[a][b]
        if c != "\0":
            states.append(c)
            col_reference.append(colI)
    s = states  # mutate in place, exactly like the reference
    for colI in range(2, len(s)):
        if s[colI] == "7" and s[colI - 1] == "7" and \
                (s[colI - 2] == "7" or s[colI - 2] == "8"):
            s[colI - 1] = "8"
    if len(s) > 1 and s[0] == "7" and (s[1] == "7" or s[1] == "8"):
        s[0] = "8"
    if len(s) > 1 and s[-1] == "7" and (s[-2] == "7" or s[-2] == "8"):
        s[-1] = "8"
    return "".join(s), col_reference


class _BFloat:
    """bfloat-equivalent: value = mantissa * 2**exp with mantissa
    renormalized into [1, 2) (0 allowed)."""

    __slots__ = ("m", "e")

    def __init__(self, m: float = 0.0, e: int = 0):
        self.m, self.e = m, e
        self._norm()

    def _norm(self):
        if self.m == 0.0:
            self.e = 0
            return
        me, ee = math.frexp(self.m)
        self.m, self.e = me, self.e + ee

    def __mul__(self, other):
        if isinstance(other, _BFloat):
            return _BFloat(self.m * other.m, self.e + other.e)
        return _BFloat(self.m * other, self.e)

    def __add__(self, other):
        if not isinstance(other, _BFloat):
            other = _BFloat(other)
        if self.m == 0.0:
            return _BFloat(other.m, other.e)
        if other.m == 0.0:
            return _BFloat(self.m, self.e)
        if self.e >= other.e:
            hi, lo = self, other
        else:
            hi, lo = other, self
        d = lo.e - hi.e
        if d < -1074:
            return _BFloat(hi.m, hi.e)
        return _BFloat(hi.m + math.ldexp(lo.m, d), hi.e)

    def ratio(self, other: "_BFloat") -> float:
        if self.m == 0.0:
            return 0.0
        return math.ldexp(self.m / other.m, self.e - other.e)


def run_oracle(column_states: str, params) -> tuple[str, list[float]]:
    """Forward/Backward posterior decode of an encoded state string
    (run(), homologymain.cc:25-63).  params is a libmems_tpu
    ops.hmm.HmmParams.  Returns (prediction 'H'/'N' string,
    per-position posteriors)."""
    n = len(column_states)
    if n == 0:
        return "", []
    obs = [int(c) - 1 for c in column_states]           # 0..7
    eh = [float(x) for x in params.emit_homologous]
    eu = [float(x) for x in params.emit_unrelated]
    start_h = params.start_homologous
    stay_h = 1.0 - params.go_unrelated - params.go_stop_from_homologous
    stay_u = 1.0 - params.go_homologous - params.go_stop_from_unrelated

    # forward: F[i] = P(obs[0..i], state at column i)
    FH = [None] * n
    FU = [None] * n
    FH[0] = _BFloat(start_h * eh[obs[0]])
    FU[0] = _BFloat((1.0 - start_h) * eu[obs[0]])
    for i in range(1, n):
        FH[i] = (FH[i - 1] * stay_h + FU[i - 1] * params.go_homologous) \
            * eh[obs[i]]
        FU[i] = (FH[i - 1] * params.go_unrelated + FU[i - 1] * stay_u) \
            * eu[obs[i]]
    # backward: B[i] = P(obs[i+1..], end | state at column i)
    BH = [None] * n
    BU = [None] * n
    BH[n - 1] = _BFloat(params.go_stop_from_homologous)
    BU[n - 1] = _BFloat(params.go_stop_from_unrelated)
    for i in range(n - 2, -1, -1):
        BH[i] = BH[i + 1] * (stay_h * eh[obs[i + 1]]) \
            + BU[i + 1] * (params.go_unrelated * eu[obs[i + 1]])
        BU[i] = BH[i + 1] * (params.go_homologous * eh[obs[i + 1]]) \
            + BU[i + 1] * (stay_u * eu[obs[i + 1]])
    total = FH[n - 1] * params.go_stop_from_homologous \
        + FU[n - 1] * params.go_stop_from_unrelated
    posts = []
    pred = []
    for i in range(n):
        p = (FH[i] * BH[i]).ratio(total)
        posts.append(p)
        pred.append("H" if p >= 0.9 else "N")
    return "".join(pred), posts


def find_hss_oracle(row_i: np.ndarray, row_j: np.ndarray, seqI: int,
                    seqJ: int, params) -> list[tuple[int, int, int, int]]:
    """findHssHomologyHMM (Islands.h:123-196): returns
    (seqI, seqJ, left_col, right_col) tuples."""
    states, col_reference = encode_columns(row_i, row_j)
    if not states:
        return []
    prediction, _ = run_oracle(states, params)
    out = []
    prev_h = 0
    for i in range(1, len(prediction)):
        if prediction[i] == "H" and prediction[i - 1] == "N":
            prev_h = i
        if prediction[i] == "N" and prediction[i - 1] == "H":
            out.append((seqI, seqJ, col_reference[prev_h],
                        col_reference[i - 1]))
            prev_h = i
    if prediction[-1] == "H":
        out.append((seqI, seqJ, col_reference[prev_h],
                    col_reference[len(prediction) - 1]))
    return out
