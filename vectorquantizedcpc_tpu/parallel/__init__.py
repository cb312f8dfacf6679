"""Parallelism layer: device mesh, named shardings, DP/TP partitioning."""
