"""Index structures: sorted-λ band index."""
