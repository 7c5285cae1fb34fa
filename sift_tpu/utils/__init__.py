"""Utilities: profiling, metrics, IO."""
