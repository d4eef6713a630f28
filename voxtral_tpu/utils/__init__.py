"""Utilities: on-the-fly quantization, profiling hooks."""
