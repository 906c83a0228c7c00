"""Reusable distributed operators (merge, scd2, dedup, similarity, text)."""
