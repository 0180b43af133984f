"""tsdfjax — TPU-native dense RGB-D 3D reconstruction engine.

A brand-new JAX/XLA/Pallas implementation of the full KinectFusion-family
capability set of the reference system hybKinectfu (see SURVEY.md):
depth preprocessing, vertex/normal pyramids, frame-to-model point-to-plane
ICP and direct-SDF (Bylow-style) camera tracking, TSDF volume integration,
raycasting, marching-cubes mesh extraction, keyframes, TUM RGB-D I/O, and
multi-host volume sharding over a TPU mesh.
"""

import jax as _jax

# TPU MXUs run f32 matmuls at bf16-ish precision by default, which is
# catastrophic for geometry: transform_points / pose composition lose
# ~0.4% relative (= millimeters at Kinect range), degrading on-chip
# tracking ~10x vs CPU (measured: strict-ICP ATE 1.86 cm on chip vs
# 0.027 cm on CPU before this, tools/prof_chip_ate.py). Full-precision
# f32 matmuls cost nothing here — geometric matmuls are (N,3)@(3,3) or
# 4x4 — and the hot volumetric sweep matmuls pass explicit bf16 inputs
# (ops/sweep.py), which this default does not affect.
# Only set when the embedding application has not chosen its own default
# (documented in README "Embedding"): tsdfjax's accuracy numbers assume
# 'highest'; a host app that configures matmul precision itself keeps
# its setting and owns the tradeoff.
if _jax.config.jax_default_matmul_precision is None:
    _jax.config.update("jax_default_matmul_precision", "highest")

from tsdfjax.config import (
    AppConfig,
    CameraIntrinsics,
    DepthPreprocessConfig,
    IcpConfig,
    IntegrateConfig,
    IOConfig,
    MarchingCubesConfig,
    RaycastConfig,
    SdfTrackerConfig,
    SwitchConfig,
    VolumeConfig,
    load_ini,
)

__version__ = "0.1.0"
