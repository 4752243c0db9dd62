"""Sources & sinks: changelog readers, the versioned target table store
(SURVEY.md §2.1)."""
