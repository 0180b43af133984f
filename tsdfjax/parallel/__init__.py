"""Multi-device / multi-host execution: device mesh, x-sharded TSDF
volume with ppermute halo exchange, psum'd tracker reductions, and the
sharded per-frame step (SURVEY.md §2.7/§5 'long-context analog').

The reference is single-process single-GPU; these components have no
reference counterpart and are mandated by BASELINE.md (north_star +
config 5): spatial domain decomposition of the volume over a mesh axis
"space", exact Schur-style psum of the per-pixel 6x6 Gauss-Newton normal
equations, and first-hit min-combination for distributed raycast.
"""

from tsdfjax.parallel.sharded import (
    HALO_DEFAULT,
    ShardedFusion,
    extract_mesh_sharded,
    make_space_mesh,
    marching_cubes_sharded,
    required_halo,
)
