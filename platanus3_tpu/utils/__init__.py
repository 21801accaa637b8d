"""Logging, metrics, profiling, checkpointing."""
