"""Observability: plots, timers, profiling helpers."""
