"""Structured-Streaming wiring (SURVEY §2.12)."""
