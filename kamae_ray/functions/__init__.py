"""Pure kernels on Arrow/numpy data — no Ray imports."""
