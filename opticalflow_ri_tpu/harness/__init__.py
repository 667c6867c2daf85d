"""Benchmark and example-run harness (ref: benchmark_of_methods.py)."""
