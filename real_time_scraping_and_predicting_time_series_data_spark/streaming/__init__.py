"""Structured Streaming twins of the reference pipeline."""
