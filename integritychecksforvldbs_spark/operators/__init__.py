"""Engine operators: selection DSL, check kernels, dedup, similarity, text."""
