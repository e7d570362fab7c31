"""Flax model zoo: ViT backbones, SFP, RPN, box/cube heads, RCNN3D."""
