"""Relational/pipeline operators: dedup, merge/upsert, evolve, ANN."""
