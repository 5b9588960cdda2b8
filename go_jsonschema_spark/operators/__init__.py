"""Dataset-level operators: stats, uniqueness, referential integrity,
distribution drift, dedup, similarity search.

These are the north-star additions the reference lacks entirely
(SURVEY.md §2.8 — the reference is a per-document predicate engine with no
joins/aggregations)."""
