"""Persistence: Parquet artifacts + JSON typed metadata."""


class StorageError(Exception):
    """Reference: src_legacy/storage/mod.rs:16-38."""
