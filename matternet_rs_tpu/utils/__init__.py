"""Utilities: synthetic fixtures, timing, logging."""
