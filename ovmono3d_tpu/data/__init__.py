"""Omni3D data pipeline: JSON loading, filtering, fixed-shape batching."""
