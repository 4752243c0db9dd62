"""Scalar / vectorized row-transform functions (SURVEY.md §2.8, §2.10)."""
