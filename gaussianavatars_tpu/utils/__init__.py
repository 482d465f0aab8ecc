"""Host utilities: profiling, debugging, image helpers."""
