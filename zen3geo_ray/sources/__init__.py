"""Sources: parquet readers with pruning + the deterministic corpus synth."""
