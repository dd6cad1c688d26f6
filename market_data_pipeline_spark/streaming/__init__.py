"""Structured Streaming jobs (see .jobs)."""
