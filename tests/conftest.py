"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip sharding is validated on a virtual CPU mesh per the build plan
(real multi-chip hardware is not available in CI); single-kernel parity
tests also run on CPU for speed and determinism.

The environment may pre-register a remote-TPU PJRT plugin via a
sitecustomize hook (PYTHONPATH) that forces ``jax_platforms=axon``, which
makes ``JAX_PLATFORMS=cpu`` ineffective in-process.  So: re-exec pytest
once with a scrubbed environment — CPU platform, 8 virtual host devices,
sitecustomize path removed.  The re-exec happens in pytest_configure with
global capture suspended so the child inherits the real stdout/stderr
(pytest's fd-level capture would otherwise swallow all output).
"""

import os
import sys


def pytest_configure(config):
    if os.environ.get("LIBMEMS_TPU_TEST_ENV") == "1":
        return
    env = dict(os.environ)
    env["LIBMEMS_TPU_TEST_ENV"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    env["XLA_FLAGS"] = flags
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon_site" not in p)

    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest", *config.invocation_params.args],
              env)
