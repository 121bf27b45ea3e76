"""Host-side utilities: profiling, logging."""
