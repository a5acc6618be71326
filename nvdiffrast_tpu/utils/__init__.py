"""Utility helpers: cameras, image ops, logging."""
