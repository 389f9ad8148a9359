"""Central JAX configuration for libmems_tpu.

64-bit integers are required host-side for seed-mer keys of weight > 15
(up to 63 bits: 2 bits/char * 31 chars + 1 strand bit).  Device kernels
use explicit 32-bit dtypes wherever possible (TPU-native); x64 mode only
changes Python-literal weak-type defaults.
"""

import jax

jax.config.update("jax_enable_x64", True)
