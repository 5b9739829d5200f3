"""Scalar/aggregate function helpers (SURVEY.md §2.8, §2.10)."""
