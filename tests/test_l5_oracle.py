"""L5 parity: device HMM + column encoding vs the loop-faithful oracle.

The oracle (tests/oracle/refimpl_l5.py) ports the reference's column
encoding (Islands.h:90-160), bfloat-equivalent forward/backward
(HomologyHMM/algebras.h semantics), and HSS harvest (Islands.h:168-196);
these tests pin libmems_tpu.islands / ops.hmm to it the way L2-L4 are
pinned to refimpl.py / refimpl_l4.py.
"""

import numpy as np
import pytest

from libmems_tpu.islands import encode_column_states, find_hss_homology_batch
from libmems_tpu.ops.hmm import (adapted_hoxd_params, hoxd_params,
                                 posterior_homologous)
from tests.oracle.refimpl_l5 import (encode_columns, find_hss_oracle,
                                     run_oracle)


def _random_pair(rng, n, mut=0.1, gap=0.05, unrelated_span=None):
    a = rng.choice(list(b"ACGT"), size=n).astype(np.uint8)
    b = a.copy()
    idx = rng.random(n) < mut
    b[idx] = rng.choice(list(b"ACGT"), size=int(idx.sum()))
    gidx = rng.random(n) < gap
    side = rng.random(n) < 0.5
    a[gidx & side] = ord("-")
    b[gidx & ~side] = ord("-")
    if unrelated_span:
        lo, hi = unrelated_span
        b[lo:hi] = rng.choice(list(b"ACGT"), size=hi - lo)
    return a, b


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_column_encoding_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    a, b = _random_pair(rng, 500, mut=0.2, gap=0.15)
    # some gap/gap columns
    both = rng.random(500) < 0.05
    a[both] = ord("-")
    b[both] = ord("-")
    sym, ref = encode_column_states(a, b)
    o_states, o_ref = encode_columns(a, b)
    assert ref.tolist() == o_ref
    # repo symbols are 0-based codes of the reference's '1'..'8'
    assert [int(c) - 1 for c in o_states] == sym.tolist()


@pytest.mark.parametrize("n", [50, 400, 3000])
def test_posterior_matches_bfloat_oracle(n):
    rng = np.random.default_rng(n)
    a, b = _random_pair(rng, n, mut=0.08, gap=0.04,
                        unrelated_span=(n // 3, 2 * n // 3))
    sym, _ = encode_column_states(a, b)
    if len(sym) == 0:
        pytest.skip("all gap/gap")
    params = hoxd_params()
    device = posterior_homologous([sym], params)[0]
    states = "".join(chr(ord("1") + int(c)) for c in sym)
    _, oracle = run_oracle(states, params)
    np.testing.assert_allclose(device, np.array(oracle), atol=2e-4)


def test_posterior_long_sequence_no_underflow():
    """1e5 columns: doubles underflow around 1e-308 — both the bfloat
    oracle and the log-space device path must survive."""
    rng = np.random.default_rng(9)
    a, b = _random_pair(rng, 100_000, mut=0.05, gap=0.02)
    sym, _ = encode_column_states(a, b)
    params = adapted_hoxd_params(0.41)
    device = posterior_homologous([sym], params)[0]
    assert np.isfinite(device).all()
    assert device.max() > 0.99  # homologous pair: mostly H
    states = "".join(chr(ord("1") + int(c)) for c in sym)
    _, oracle = run_oracle(states, params)
    np.testing.assert_allclose(device[:2000], np.array(oracle[:2000]),
                               atol=2e-4)


@pytest.mark.parametrize("seed", [3, 4])
def test_hss_segments_match_oracle(seed):
    rng = np.random.default_rng(seed)
    n = 2000
    a, b = _random_pair(rng, n, mut=0.05, gap=0.02,
                        unrelated_span=(800, 1400))
    params = hoxd_params()
    got = find_hss_homology_batch([(a, b, 0, 1)], params)[0]
    want = find_hss_oracle(a, b, 0, 1, params)
    got_t = [(h.seqI, h.seqJ, h.left_col, h.right_col) for h in got]
    assert got_t == want
    # sanity: the unrelated span is NOT inside any HSS
    for _, _, lo, hi in want:
        assert not (lo < 1000 < hi and lo < 1200 < hi) or \
            (hi - max(lo, 800)) < 400
