"""Pure vectorized kernels — Arrow/numpy in, Arrow/numpy out. No Ray imports,
so every kernel is unit-testable on plain ``pyarrow.Table`` batches."""
