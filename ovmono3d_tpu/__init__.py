"""ovmono3d_tpu — TPU-native open-vocabulary monocular 3D object detection.

A from-scratch JAX/XLA/Pallas framework with the capabilities of OVMono3D
(arXiv 2411.16833; reference implementation surveyed in /root/repo/SURVEY.md).

Subpackages
-----------
- ``ops``       : detection kernel library (NMS, ROIAlign, 3D IoU, rotations,
                  anchors, matching, fused attention) — fixed-shape, jittable.
- ``utils``     : 3D geometry core (cuboids, projection, virtual depth,
                  allocentric pose) and priors computation.
- ``models``    : Flax modules — DINOv2 ViT + Simple Feature Pyramid, RPN,
                  Fast R-CNN box head, Cube head, RCNN3D meta-architecture.
- ``data``      : Omni3D dataset loading / filtering / fixed-shape batching.
- ``evaluation``: Omni3D-protocol AP2D/AP3D + NHD evaluation.
- ``parallel``  : mesh construction and sharded (pjit) train/eval steps.
- ``train``     : optimizer groups, stabilization loop, checkpointing.
"""

__version__ = "0.1.0"
