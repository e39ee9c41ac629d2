"""Structured Streaming layer: shared batch/stream transforms, sinks, Kinesis plumbing."""
