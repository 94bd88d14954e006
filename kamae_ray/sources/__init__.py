"""Readers/writers and deterministic synthetic-data sources."""
