"""Device compute kernels: Lie algebra, projection, triangulation, matching,
ORB feature extraction, RANSAC pose estimation, and bundle-adjustment solvers.

Everything here is pure-functional jax (jit/vmap/grad-safe) or a Pallas TPU
kernel; no host state.  These are the TPU-native replacements for the
reference's borrowed OpenCV/SciPy native layer (SURVEY §2.3).
"""
