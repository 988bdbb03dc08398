"""Structured Streaming extension (net-new vs the reference, which is
batch-only — SURVEY.md §1.6)."""
