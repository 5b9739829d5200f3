"""Structured Streaming surface (SURVEY.md §2.9 St1-St6)."""
