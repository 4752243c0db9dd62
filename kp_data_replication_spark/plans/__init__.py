"""Physical-plan auditing (SURVEY.md §4 verification hooks)."""
