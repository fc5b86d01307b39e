"""Structured Streaming pipeline assembly (reference E1/E2 run modes)."""
