"""Utilities: golden oracle, image output, metrics."""
