"""Incremental / streaming index maintenance (LSM-style delta + compaction)."""
