"""Structured Streaming layer (SURVEY.md §2.8 S6/T1-T5)."""
