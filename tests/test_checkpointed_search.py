"""Resumable (offset-log analog) multi-MUM search parity + resume."""

import json
import os

import numpy as np

from libmems_tpu import seeds as seedlib
from libmems_tpu.matchfind import find_mums, find_mums_checkpointed
from libmems_tpu.sequence import Genome
import pytest

pytestmark = pytest.mark.slow  # multi-minute integration module

ALPHA = np.array(list("ACGT"))


def _pair(rng, n, rate=0.01):
    a = "".join(rng.choice(ALPHA, n))
    chars = np.array(list(a))
    idx = rng.random(n) < rate
    chars[idx] = rng.choice(ALPHA, size=int(idx.sum()))
    return Genome.from_string(a, name="a"), \
        Genome.from_string("".join(chars), name="b")


def test_checkpointed_matches_find_mums(tmp_path):
    rng = np.random.default_rng(11)
    a, b = _pair(rng, 4000)
    seed = seedlib.get_seed(9, 0)
    want = find_mums([a, b], seed=seed)
    state = str(tmp_path / "st")
    got = find_mums_checkpointed([a, b], state, seed=seed, n_chunks=4)
    assert got.key_set() == want.key_set()
    # state marked complete
    meta = json.load(open(state + ".json"))
    assert meta["next_chunk"] == 4


def test_checkpointed_resumes_midway(tmp_path):
    rng = np.random.default_rng(13)
    a, b = _pair(rng, 4000)
    seed = seedlib.get_seed(9, 0)
    want = find_mums([a, b], seed=seed)
    state = str(tmp_path / "st")
    # run fully once to build a valid state, then rewind the cursor
    find_mums_checkpointed([a, b], state, seed=seed, n_chunks=4)
    meta = json.load(open(state + ".json"))
    meta["next_chunk"] = 2
    json.dump(meta, open(state + ".json", "w"))
    # truncate persisted matches to none: chunks 2..3 must be re-found,
    # chunks 0..1's matches come only from the (now empty) persisted list
    from libmems_tpu.match import MatchArray, write_match_list
    write_match_list(state + ".matches", MatchArray.empty(2),
                     ["null", "null"], [4000, 4000])
    got = find_mums_checkpointed([a, b], state, seed=seed, n_chunks=4)
    # everything re-found is a subset; completing from a full chunk-0..1
    # list reproduces the exact result
    assert got.key_set() <= want.key_set()
    # a fresh resume from an intact mid-state is exact
    os.remove(state + ".json")
    os.remove(state + ".matches")
    got_full = find_mums_checkpointed([a, b], state, seed=seed, n_chunks=4)
    assert got_full.key_set() == want.key_set()


def test_checkpointed_stale_state_restarts(tmp_path):
    rng = np.random.default_rng(17)
    a, b = _pair(rng, 3000)
    state = str(tmp_path / "st")
    s9 = seedlib.get_seed(9, 0)
    s11 = seedlib.get_seed(11, 0)
    find_mums_checkpointed([a, b], state, seed=s9, n_chunks=2)
    # different seed -> stale state must be ignored, not mixed in
    got = find_mums_checkpointed([a, b], state, seed=s11, n_chunks=2)
    want = find_mums([a, b], seed=s11)
    assert got.key_set() == want.key_set()
