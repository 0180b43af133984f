"""TPU-optimized compute paths (MXU shear-warp sweeps, packed gathers).

The naive ports of the reference's CUDA kernels are gather-bound on TPU
(~8.5 ns/element for XLA gathers); the ops here restructure the math so
the hot loops run on the MXU instead. Exact gather-based reference paths
remain in tsdfjax.volume / tsdfjax.raycast for parity testing.
"""

from tsdfjax.ops.sweep import (
    fast_integrate,
    fast_raycast,
    project_image_to_volume,
)
