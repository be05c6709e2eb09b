"""Scalar column functions (SURVEY.md §2.8) and text analysis."""
