"""TPU compute primitives: RNG, compaction."""
