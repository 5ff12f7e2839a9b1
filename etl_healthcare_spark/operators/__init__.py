"""Dataflow operators (SURVEY §2.2-2.6 P/V/U ops + LLM-pipeline ops)."""
