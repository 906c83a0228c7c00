"""Scalar/column function helpers (nested-cell parsing, messy numerics)."""
