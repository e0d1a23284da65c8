"""Manifests, lineage, checkpoint/resume helpers."""
