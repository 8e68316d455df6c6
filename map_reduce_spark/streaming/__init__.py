"""Structured Streaming jobs mirroring the batch operator semantics."""
