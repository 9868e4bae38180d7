"""Device-mesh parallelism (data parallel over a TPU slice)."""
