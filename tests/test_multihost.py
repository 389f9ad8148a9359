"""Multi-process (multi-host shape) dryrun under pytest: 2 processes x
4 virtual CPU devices, one global mesh — host-sharded SML build,
key-table exchange, sharded finders, per-worker bit-parity
(libmems_tpu/parallel/multihost_dryrun.py)."""

import pytest

pytestmark = pytest.mark.slow


def test_two_process_dryrun_parity():
    from libmems_tpu.parallel.multihost_dryrun import run_multihost_dryrun
    run_multihost_dryrun(nproc=2, local_devices=4)
