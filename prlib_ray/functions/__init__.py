"""Scalar text functions shared across stages (compiled once per worker)."""
