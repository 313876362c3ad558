"""Numeric kernels: distances, kNN graphs, Laplacians, taumode λ scoring."""
