"""On-chip benchmarks (real TPU via the axon relay; see verify skill)."""
