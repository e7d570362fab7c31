"""Visualization and report tables."""
