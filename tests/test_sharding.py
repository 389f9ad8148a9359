"""Multi-device sharding: seed-prefix routing parity on a virtual mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libmems_tpu import seeds as seedlib
from libmems_tpu.matchfind import _mum_seed_flags, _sorted_seed_table
from libmems_tpu.ops.mers import canonical_seed_keys_np
from libmems_tpu.parallel import make_mesh, sharded_mum_seed_count
from libmems_tpu.parallel.shard import pad_table_for_mesh, sharded_seed_table

pytestmark = pytest.mark.slow  # multi-minute integration module

needs_devices = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices")


def _table(seqs, seed):
    keys_list = [canonical_seed_keys_np(s, seed) for s in seqs]
    keys = np.concatenate(keys_list)
    gid = np.concatenate([np.full(len(k), i, np.int32)
                          for i, k in enumerate(keys_list)])
    pos = np.concatenate([np.arange(len(k), dtype=np.int32)
                          for k in keys_list])
    return keys, gid, pos


def _synth(rng, n, mutate=0.02):
    a = rng.integers(0, 4, size=n).astype(np.uint8)
    b = a.copy()
    idx = rng.random(n) < mutate
    b[idx] = rng.integers(0, 4, size=int(idx.sum())).astype(np.uint8)
    return [a, b]


@needs_devices
@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_count_parity(n_dev):
    seed = seedlib.get_seed(9, 0)
    rng = np.random.default_rng(n_dev)
    seqs = _synth(rng, 700)
    keys, gid, pos = _table(seqs, seed)
    mesh = make_mesh(n_dev)
    k, g, p = pad_table_for_mesh(keys, gid, pos, n_dev)
    count = int(sharded_mum_seed_count(
        jnp.asarray(k), jnp.asarray(g), jnp.asarray(p), mesh,
        seedlib.seed_weight(seed)))
    content, gg, pp, ss = _sorted_seed_table(
        jnp.asarray(keys), jnp.asarray(gid), jnp.asarray(pos))
    _, _, _, n_rows = _mum_seed_flags(content, gg, pp, ss, 0, 1000)
    assert count == int(n_rows)


@needs_devices
def test_routing_preserves_all_rows():
    seed = seedlib.get_seed(7, 0)
    rng = np.random.default_rng(99)
    seqs = _synth(rng, 500, mutate=0.1)
    keys, gid, pos = _table(seqs, seed)
    mesh = make_mesh(8)
    k, g, p = pad_table_for_mesh(keys, gid, pos, 8)
    c2, g2, p2, s2 = sharded_seed_table(
        jnp.asarray(k), jnp.asarray(g), jnp.asarray(p), mesh,
        seedlib.seed_weight(seed))
    c2, g2, p2 = np.asarray(c2), np.asarray(g2), np.asarray(p2)
    sentinel = np.iinfo(np.uint32).max >> 1
    rows = set()
    for d in range(8):
        m = c2[d] != sentinel
        rows.update(zip(c2[d][m].tolist(), g2[d][m].tolist(),
                        p2[d][m].tolist()))
    orig = set(zip((keys >> 1).tolist(), gid.tolist(), pos.tolist()))
    assert rows == orig


@needs_devices
def test_content_runs_are_device_local():
    seed = seedlib.get_seed(9, 0)
    rng = np.random.default_rng(7)
    seqs = _synth(rng, 600)
    keys, gid, pos = _table(seqs, seed)
    mesh = make_mesh(8)
    k, g, p = pad_table_for_mesh(keys, gid, pos, 8)
    c2, _, _, _ = sharded_seed_table(
        jnp.asarray(k), jnp.asarray(g), jnp.asarray(p), mesh,
        seedlib.seed_weight(seed))
    c2 = np.asarray(c2)
    sentinel = np.iinfo(np.uint32).max >> 1
    seen: dict[int, int] = {}
    for d in range(8):
        for c in np.unique(c2[d][c2[d] != sentinel]):
            assert seen.setdefault(int(c), d) == d
