"""Batch and streaming source/sink plumbing."""
