"""Relational operator library — one module per family (SURVEY.md §2)."""
