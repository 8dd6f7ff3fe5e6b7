"""Placeholder — filled in as the corresponding operators land."""
