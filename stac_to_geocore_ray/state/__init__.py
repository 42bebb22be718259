"""Lineage manifests and resumable-write state."""
