"""Auxiliary subsystems: checkpointing, profiling, metrics."""
