"""Reusable relational operators (SURVEY.md §2.3, §2.5-2.7):
joins (incl. as-of), top-k, windowed/event-time aggregations."""
