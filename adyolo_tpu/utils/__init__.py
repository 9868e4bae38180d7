"""Runtime utilities: RNG discipline, logging, profiling."""
