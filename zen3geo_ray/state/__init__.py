"""Execution state: lineage manifests, resumable partitioned writes."""
