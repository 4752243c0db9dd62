"""Structured-Streaming CDC apply loop (SURVEY.md §2.9)."""
