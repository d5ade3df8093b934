"""Core runtime: mesh/distributed init, LR schedules, checkpointing, metrics."""
