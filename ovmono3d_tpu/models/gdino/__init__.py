"""GroundingDINO-JAX: open-vocabulary 2D detection (Swin-B + BERT + DETR).

TPU-native re-design of the pip-installed GroundingDINO used by the
reference's ROIHeads3DGDINO (roi_heads_gdino.py; SURVEY.md §2.1 #3, §2.3).
"""
