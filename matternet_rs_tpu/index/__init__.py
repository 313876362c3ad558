"""Index structures: sorted-λ band index, IVF bucketed pruning."""
