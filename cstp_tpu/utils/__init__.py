"""Cross-cutting utilities: profiling/roofline helpers."""
