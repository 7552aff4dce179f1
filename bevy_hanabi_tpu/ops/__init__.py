"""TPU compute primitives: RNG, compaction, sort, rasterization kernels."""
