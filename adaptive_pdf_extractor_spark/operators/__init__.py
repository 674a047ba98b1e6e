"""Distributed operators: extraction, rule mining, layout, dedup, similarity."""
