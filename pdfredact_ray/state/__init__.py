"""Stateful job-level concerns: lineage, checkpoint/resume, metrics."""
