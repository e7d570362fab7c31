"""Geometry core and generic utilities."""
