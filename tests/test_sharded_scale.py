"""BASELINE config 5 (scaled down): 30-genome seed-prefix-sharded MUM
discovery on the virtual 8-device mesh — parity vs the single-device
path, with the bounded O(rows) routing buffers."""

import numpy as np
import pytest

import jax

from libmems_tpu import seeds as seedlib
from libmems_tpu.matchfind import find_mums
from libmems_tpu.parallel.shard import make_mesh, sharded_find_mums
from libmems_tpu.sml import SortedMerList

pytestmark = pytest.mark.slow  # multi-minute integration module


def _family(rng, n_genomes, length, mutate=0.02):
    anc = rng.integers(0, 4, size=length).astype(np.uint8)
    out = []
    for _ in range(n_genomes):
        g = anc.copy()
        idx = rng.random(length) < mutate
        g[idx] = rng.integers(0, 4, size=int(idx.sum())).astype(np.uint8)
        out.append(g)
    return out


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_thirty_genomes_sharded_parity():
    rng = np.random.default_rng(0)
    genomes = _family(rng, 30, 1200)
    seed = seedlib.get_seed(9, 0)
    smls = [SortedMerList.create(g, seed) for g in genomes]

    want = find_mums(smls)
    mesh = make_mesh(8)
    got = sharded_find_mums(smls, mesh, capacity=1 << 12)
    assert got.key_set() == want.key_set()
    assert len(got) > 0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_sharded_routing_buffers_are_bounded():
    """The all_to_all send capacity must be O(local rows / n_dev), not
    O(local rows) — the round-1 n_dev x blowup stays gone."""
    import jax.numpy as jnp
    from libmems_tpu.parallel import shard as sh

    captured = {}
    orig = jax.lax.all_to_all

    def spy(x, *args, **kw):
        captured.setdefault("shapes", []).append(tuple(x.shape))
        return orig(x, *args, **kw)

    rng = np.random.default_rng(1)
    genomes = _family(rng, 6, 1500)
    seed = seedlib.get_seed(9, 0)
    smls = [SortedMerList.create(g, seed) for g in genomes]
    mesh = make_mesh(8)
    jax.lax.all_to_all = spy
    try:
        sharded_find_mums(smls, mesh, capacity=1 << 12)
    finally:
        jax.lax.all_to_all = orig
    n_dev = 8
    # capacities derive from the BUCKET-padded total (shape stability,
    # PERF rule 27) — still O(total/n_dev), constant <= 1.5x
    from libmems_tpu.parallel.shard import _bucketed_total
    total = _bucketed_total(smls, n_dev)
    local = -(-total // n_dev)
    for shape in captured["shapes"]:
        assert shape[0] == n_dev
        assert shape[1] <= max(256, 2 * (-(-local // n_dev))) + 1, shape
