"""Placeholder — filled in during the build (SURVEY.md §7)."""
