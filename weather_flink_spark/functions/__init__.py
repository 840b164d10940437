"""Scalar / text / similarity function libraries."""
