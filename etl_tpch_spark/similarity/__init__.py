"""Similarity search over embedding columns (north-star ANN operators)."""
