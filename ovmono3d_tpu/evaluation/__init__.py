"""Omni3D-protocol evaluation: AP2D, AP3D (exact 3D IoU), NHD."""
