"""Plan-level helpers: annotation-aware predicate rewriting (SURVEY.md
§4.1) so user predicates on lossless string columns hit typed,
min/max-indexed annotation columns instead."""
