"""Native out-of-core SML builder (dmSML analog): bit parity with the
JAX/numpy key pipelines and SMLT file equality with the in-memory path
(reference: dmSML/dmsort.c, FileSML::dmCreate)."""

import numpy as np
import pytest

from libmems_tpu import seeds as seedlib
from libmems_tpu.native import available, create_file_sml, native_keys
from libmems_tpu.ops.mers import canonical_seed_keys_np
from libmems_tpu.sml import SortedMerList

pytestmark = pytest.mark.skipif(not available(),
                                reason="native toolchain unavailable")

rng = np.random.default_rng(0)


@pytest.mark.parametrize("weight", [5, 9, 15, 21])
def test_native_keys_bit_parity(weight):
    seed = seedlib.get_seed(weight, 0)
    codes = rng.integers(0, 4, size=5000).astype(np.uint8)
    got = native_keys(codes, seed)
    want = canonical_seed_keys_np(codes, seed).astype(np.uint64)
    assert (got == want).all()


def test_native_keys_solid_seed():
    seed = seedlib.solid_seed(11)
    codes = rng.integers(0, 4, size=2000).astype(np.uint8)
    got = native_keys(codes, seed)
    want = canonical_seed_keys_np(codes, seed).astype(np.uint64)
    assert (got == want).all()


def test_create_file_sml_matches_memory(tmp_path):
    seed = seedlib.get_seed(9, 0)
    codes = rng.integers(0, 4, size=200_000).astype(np.uint8)
    out = tmp_path / "g.sml"
    # small mem limit to force multiple bins (out-of-core path)
    create_file_sml(codes, seed, str(out), scratch_dir=str(tmp_path),
                    mem_limit=1 << 20)
    disk = SortedMerList.load(str(out))
    mem = SortedMerList.create(codes, seed)
    assert disk.length == mem.length
    assert disk.n_windows == mem.n_windows
    assert (np.asarray(disk.keys) ==
            np.asarray(mem.keys).astype(np.uint64)).all()
    assert (np.asarray(disk.sorted_keys) ==
            np.asarray(mem.sorted_keys).astype(np.uint64)).all()
    # positions within equal-key runs must both be ascending (stable)
    assert (np.asarray(disk.sorted_positions) ==
            np.asarray(mem.sorted_positions)).all()


def test_create_file_sml_circular(tmp_path):
    seed = seedlib.get_seed(5, 0)
    codes = rng.integers(0, 4, size=500).astype(np.uint8)
    out = tmp_path / "c.sml"
    create_file_sml(codes, seed, str(out), scratch_dir=str(tmp_path),
                    circular=True)
    disk = SortedMerList.load(str(out))
    mem = SortedMerList.create(codes, seed, circular=True)
    assert disk.n_windows == mem.n_windows
    assert (np.asarray(disk.keys) ==
            np.asarray(mem.keys).astype(np.uint64)).all()


def test_create_big_entrypoint(tmp_path):
    seed = seedlib.get_seed(7, 0)
    codes = rng.integers(0, 4, size=10_000).astype(np.uint8)
    sml = SortedMerList.create_big(codes, seed, str(tmp_path / "big.sml"),
                                   scratch_dir=str(tmp_path))
    mem = SortedMerList.create(codes, seed)
    assert (np.asarray(sml.sorted_positions) ==
            np.asarray(mem.sorted_positions)).all()


def test_big_create_python_fallback(tmp_path):
    """Pure-python split-sort-merge BigCreate (FileSML.cpp:417-660):
    multi-chunk out-of-core build must be bit-identical to the
    in-memory device sort."""
    import numpy as np
    from libmems_tpu import seeds as seedlib
    from libmems_tpu.sml import SortedMerList

    rng = np.random.default_rng(5)
    codes = rng.integers(0, 4, size=30_000).astype(np.uint8)
    seed = seedlib.get_seed(9, 0)
    path = str(tmp_path / "big.sml")
    # mem_limit small enough to force many chunks
    sml = SortedMerList._big_create_py(codes, seed, path,
                                       mem_limit=48 * 4096)
    ref = SortedMerList.create(codes, seed)
    assert sml.n_windows == ref.n_windows
    assert np.array_equal(np.asarray(sml.keys), np.asarray(ref.keys))
    assert np.array_equal(np.asarray(sml.sorted_positions),
                          np.asarray(ref.sorted_positions))
    # file round-trips through the standard loader
    again = SortedMerList.load(path)
    assert np.array_equal(np.asarray(again.sorted_positions),
                          np.asarray(ref.sorted_positions))
