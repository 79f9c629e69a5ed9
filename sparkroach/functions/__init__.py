"""Reusable column-level and batch-level operator libraries."""
