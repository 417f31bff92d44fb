"""Partitioning, skew salting, lineage manifests, resume."""
