"""Corpus sources: reference-JSON converters, synthetic generator, PDF source."""
