"""Batch relational operator surface (SURVEY.md §2.2)."""
