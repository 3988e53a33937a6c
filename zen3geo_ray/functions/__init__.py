"""Scalar / vectorized functions: hashing, geocoding, text analysis."""
