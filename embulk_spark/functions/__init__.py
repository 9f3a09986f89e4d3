"""Scalar/vectorized functions: type coercion, guess, extraction, text ops."""
