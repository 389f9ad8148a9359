"""Central JAX configuration for libmems_tpu.

64-bit integers are required host-side for seed-mer keys of weight > 15
(up to 63 bits: 2 bits/char * 31 chars + 1 strand bit).  Device kernels
use explicit 32-bit dtypes wherever possible (TPU-native); x64 mode only
changes Python-literal weak-type defaults.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: remote-TPU (PJRT plugin) compiles of the
# genome-scale sort/scan pipelines take tens of seconds each; the cache
# turns every repeat invocation (tests, bench, production reruns) into a
# millisecond executable load.  Repo-local by default, env-overridable.
_cache_dir = os.environ.get(
    "LIBMEMS_TPU_COMPILE_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"))
if _cache_dir and _cache_dir != "0":
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
