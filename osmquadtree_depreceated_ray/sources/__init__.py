"""Readers and deterministic synthetic fixture generators."""
