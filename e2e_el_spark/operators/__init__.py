"""Operator library: mention detection, blocking, scoring, clustering,
dedup, similarity search, text analysis — each module documents which
SURVEY.md §2 operator ids it implements."""
