"""Device-side compute kernels (JAX/XLA/Pallas) for the alignment pipeline."""
