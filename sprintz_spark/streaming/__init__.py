"""Structured Streaming: watermarked rollups + encoded micro-batch sink."""
