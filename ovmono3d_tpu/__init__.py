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

# Restore standard JAX_PLATFORMS env-var semantics: the container's
# sitecustomize (axon TPU tunnel registration) force-sets
# jax_platforms="axon,cpu" via config, which overrides the env var. Honoring
# the env var again lets the CLIs run CPU smoke tests with JAX_PLATFORMS=cpu
# (tests/conftest.py does its own pinning).
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass  # backend already initialized: keep whatever the caller chose
del _os
