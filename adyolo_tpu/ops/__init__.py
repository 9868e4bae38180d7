"""Device-side DSP / geometry kernels (JAX/XLA, Pallas where it pays)."""
