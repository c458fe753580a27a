"""Scalar/aggregate function library (SURVEY.md §2.8, §2.10)."""
