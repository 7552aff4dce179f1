"""TPU compute primitives: RNG, compaction, step kernels."""
