"""Pipelines and checkpoint/resume bookkeeping."""
