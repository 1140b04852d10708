"""bundle_adjustment_tpu — a TPU-native monocular SfM / visual-odometry engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
pipeline (egirgin/bundle_adjustment): ORB-style feature extraction, tiled
Hamming matching, essential-matrix/PnP RANSAC pose estimation, keyframe
selection, DLT triangulation, a persistent keyframe + map-point world model,
and windowed local bundle adjustment with a blocked Schur-complement
Levenberg-Marquardt solver.

Layout
------
- ``ops``       — device compute: Lie algebra, projection, triangulation,
                  Hamming matching (Pallas), ORB (FAST/Harris/rBRIEF),
                  RANSAC pose, bundle-adjustment solvers.
- ``models``    — world state: structure-of-arrays map store, keyframe policy,
                  and the frame-pipeline orchestrator.
- ``parallel``  — device meshes, sharded matching, distributed Schur BA.
- ``utils``     — config presets, I/O (video/images/PCD), structured logging,
                  visualization, log analytics.

Design stance (see SURVEY.md): static shapes everywhere (fixed feature
capacity, padded observation tables with validity masks), autodiff residuals
instead of finite differences, and batched-hypothesis RANSAC instead of
data-dependent loops, so every stage jits once and runs on the MXU/VPU.
"""

__version__ = "0.1.0"

from bundle_adjustment_tpu.config import PipelineConfig, CameraModel  # noqa: F401
