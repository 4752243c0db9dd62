"""Relational + CDC operators (SURVEY.md §2)."""
