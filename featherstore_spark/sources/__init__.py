"""Sources/sinks + catalog (SURVEY.md §2.1, §2.11)."""
