"""tsdfjax — TPU-native dense RGB-D 3D reconstruction engine.

A brand-new JAX/XLA/Pallas implementation of the full KinectFusion-family
capability set of the reference system hybKinectfu (see SURVEY.md):
depth preprocessing, vertex/normal pyramids, frame-to-model point-to-plane
ICP and direct-SDF (Bylow-style) camera tracking, TSDF volume integration,
raycasting, marching-cubes mesh extraction, keyframes, TUM RGB-D I/O, and
multi-host volume sharding over a TPU mesh.
"""

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
