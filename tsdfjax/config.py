"""Configuration: frozen dataclasses + INI compatibility loader.

Mirrors the reference's AppParams struct-of-structs and its INI surface
(/root/reference/src/AppParams.h:12-95, AppParamsProducer.cpp:18-171,
config.ini:1-57, README_ABOUT_CONFIG) so a reference user's config.ini
loads unchanged. All configs are frozen/hashable so they can be passed as
static arguments to jit.

Defaults below are the reference's shipped defaults (config.ini:24-48).
The derived raycast step is fRayIncrement = raycast_increment_factor *
integrate_sdf_trunc (AppParamsProducer.cpp:113-117).
"""

from __future__ import annotations

import configparser
import dataclasses
from dataclasses import dataclass, field

from tsdfjax.geometry import CameraIntrinsics


@dataclass(frozen=True)
class SwitchConfig:
    """Feature switches (AppParams.h:86-95)."""

    use_color: bool = True
    record_rgbd: bool = False
    use_dataset_rgbd: bool = False
    record_trajectory: bool = False
    use_traj_from_file: bool = False
    color_angle_weight: bool = True
    use_sdf_tracker: bool = False


@dataclass(frozen=True)
class DepthPreprocessConfig:
    """Depth truncation band + bilateral filter (AppParams.h:61-67)."""

    max_trunc_m: float = 4.0
    min_trunc_m: float = 0.3
    sigma_depth: float = 0.02
    sigma_pixel: float = 2.0


@dataclass(frozen=True)
class VolumeConfig:
    """Dense TSDF volume (AppParams.h:68-73)."""

    resolution: int = 256
    size_m: float = 2.0
    max_weight: float = 128.0

    @property
    def voxel_size_m(self) -> float:
        return self.size_m / self.resolution


@dataclass(frozen=True)
class IntegrateConfig:
    """TSDF fusion (AppParams.h:81-85)."""

    sdf_trunc_m: float = 0.04
    max_integrate_dist_m: float = 2.0


@dataclass(frozen=True)
class RaycastConfig:
    """Ray-march step: factor * sdf_trunc (AppParamsProducer.cpp:113-117)."""

    increment_factor: float = 0.8
    sdf_trunc_m: float = 0.04

    @property
    def ray_increment_m(self) -> float:
        return self.increment_factor * self.sdf_trunc_m


@dataclass(frozen=True)
class IcpConfig:
    """Frame-to-model point-to-plane ICP (AppParams.h:20-29).

    Iteration schedule per pyramid level count is the reference's hardcoded
    table (CameraPoseFinderICP.cpp:14-34).
    """

    pyramid_levels: int = 3
    dist_thresh_m: float = 0.1
    normal_sin_thresh: float = 0.2
    dist_shake_m: float = 0.4
    angle_shake_rad: float = 0.4
    # stride over SOURCE pixels at the finest level (targets stay full
    # resolution). The reference uses every pixel (stride 1, the default
    # here for strict parity); ~75k of the ~300k valid constraints per
    # iteration estimate the same 6-DoF system to well below the tracking
    # noise floor, and TPU gather cost is per index, so stride 2 cuts the
    # tracker's time ~3x. Opt in via the INI [tsdfjax] section or the
    # dataclass; the shipped fast configs and bench.py set 2.
    source_subsample: int = 1
    # stop a level's GN iterations once the 6-DoF update drops below this
    # norm. 0 (the default — strict parity: the reference's ICP has no
    # early exit) runs the full reference schedule. The reference's SDF
    # tracker stops at ||x|| < 1e-3 (CameraPoseFinderSDF.cpp:87-90); the
    # fast configs adopt the same idea one decade tighter (1e-4) so the
    # solution matches the full schedule to float noise while typical
    # gentle motion converges in ~1/3 the iterations.
    converge_eps: float = 0.0
    # associate finest-level source pixels into the HALF-RES model map
    # (pyramid level 1) instead of the full-res one. XLA:TPU gathers
    # from tables over ~300k rows fall off a measured cliff (~13 ns/idx
    # vs ~2.5 at <=128k rows; tools/prof_r5f.py), making the level-0
    # association gather the single most expensive ICP op. A +-1 px
    # association shift slides the target along the surface, which the
    # point-to-plane metric is first-order insensitive to. Opt-in via
    # [tsdfjax] icp_coarse_assoc; strict parity keeps the reference's
    # full-res lookup (CalPointToPlaneErrSolverParams.cu:17-60).
    coarse_assoc: bool = False

    @property
    def iters_per_level(self) -> tuple[int, ...]:
        """Coarse-last ordering: index = level (0 = finest)."""
        table = {1: (3,), 2: (10, 5), 3: (10, 5, 4)}
        if self.pyramid_levels not in table:
            raise ValueError(f"unsupported pyramid level count {self.pyramid_levels}")
        return table[self.pyramid_levels]


@dataclass(frozen=True)
class SdfTrackerConfig:
    """Direct SDF (Bylow) tracker (AppParams.h:30-35).

    w_h / convergence eps are the reference's hardcoded values
    (CalSDFErrSolverParams.cu:118, CameraPoseFinderSDF.cpp:54).
    """

    max_iters: int = 6
    dist_shake_m: float = 0.4
    angle_shake_rad: float = 0.4
    rotation_step_h: float = 0.001
    convergence_eps: float = 0.001
    # stride over source pixels, like IcpConfig.source_subsample (strict
    # parity = 1, every pixel like the reference; the fast configs set 2:
    # ~77k of ~300k constraints estimate the same 6-DoF system well below
    # the tracking noise floor, and TPU gather cost is per sample)
    source_subsample: int = 1
    # q-grid density of the sweep tracker relative to the camera image
    # (ops/sweep.sdf_sweep_prepare). The pixel->q nearest association
    # quantizes each pixel to its closest q ray; 1.1 loses ~2x tracking
    # accuracy to that quantization (tools/prof_sdf_acc.py ablation:
    # 5.32 mm rmse at 1.1 vs 2.75 mm at 1.6 vs packed-field 2.25 mm).
    # Cost is ~2x the per-iteration normal-equation sweep, well inside
    # the tracker's fps headroom.
    q_oversample: float = 1.6
    # Rebuild the pixel<->q association at every GN iteration instead of
    # once after the first step. Costs one extra prepare per iteration;
    # removes association staleness for fast inter-frame motion.
    rebuild_assoc_every_iter: bool = False
    # Huber IRLS scale (normalized-TSDF units) for the sweep tracker's
    # residuals; 0 disables (reference parity: plain least squares,
    # CalSDFErrSolverParams.cu:88-108). Measured on the sigma=0.005
    # stress point: downweighting large residuals HURT (0.52 cm -> 0.76
    # at delta 0.3, 1.77 at 0.5) — early GN iterations carry large
    # honest residuals from inter-frame motion and IRLS misdirects them.
    # Kept as an option for high-outlier data; use_filtered_depth below
    # is the fix that actually works.
    huber_delta: float = 0.0
    # Validity-aware one-sided SDF gradients near map holes: the sweep
    # tracker's in-plane central differences read unobserved (tsdf = 0)
    # neighbors at hole boundaries, corrupting the GN rows exactly where
    # blob-dropout data needs them (ATE_r04_part7: 1.9 cm, 14x ICP).
    # With this flag, a difference falls back to the one-sided form when
    # a neighbor sample's validity is below threshold (reference parity
    # keeps plain central differences — the reference's numeric scheme
    # simply rejects those pixels via its 13-sample validity).
    hole_aware_gradient: bool = False
    # Evaluate the SDF residuals at points unprojected from the
    # bilateral-FILTERED depth instead of the raw trunced depth. The
    # reference feeds the tracker raw trunced depth
    # (CalSDFErrSolverParams.cu uses raw_depth) while its ICP tracks on
    # filtered vertex maps — this asymmetry is much of the SDF tracker's
    # noise fragility (measured: 0.52 -> 0.41 cm at sigma=0.005). Off by
    # default for reference parity; the fast profile enables it.
    use_filtered_depth: bool = False


@dataclass(frozen=True)
class MarchingCubesConfig:
    """Mesh extraction budget (AppParams.h:75-80)."""

    max_triangles: int = 1_500_000


@dataclass(frozen=True)
class IOConfig:
    mesh_filename: str = "output/mesh.obj"
    rgbd_read_filename: str = ""
    rgbd_write_filename: str = ""
    traj_read_filename: str = ""
    traj_write_filename: str = ""


_DEFAULT_CAM = dict(width=640, height=480, fx=525.0, fy=525.0, cx=319.5, cy=239.5)


@dataclass(frozen=True)
class AppConfig:
    """Top-level config; one instance drives the whole pipeline."""

    switches: SwitchConfig = field(default_factory=SwitchConfig)
    depth_camera: CameraIntrinsics = field(
        default_factory=lambda: CameraIntrinsics(**_DEFAULT_CAM)
    )
    rgb_camera: CameraIntrinsics = field(
        default_factory=lambda: CameraIntrinsics(**_DEFAULT_CAM)
    )
    preprocess: DepthPreprocessConfig = field(default_factory=DepthPreprocessConfig)
    volume: VolumeConfig = field(default_factory=VolumeConfig)
    integrate: IntegrateConfig = field(default_factory=IntegrateConfig)
    icp: IcpConfig = field(default_factory=IcpConfig)
    sdf_tracker: SdfTrackerConfig = field(default_factory=SdfTrackerConfig)
    marching_cubes: MarchingCubesConfig = field(default_factory=MarchingCubesConfig)
    io: IOConfig = field(default_factory=IOConfig)
    # use the MXU shear-warp integrate/raycast (tsdfjax.ops.sweep) instead
    # of the exact gather-based reference-semantics paths (~25x faster on
    # TPU; see ops/sweep.py for the small documented semantics deltas)
    fast_ops: bool = True

    @property
    def raycast(self) -> RaycastConfig:
        return RaycastConfig(
            increment_factor=self._raycast_increment_factor,
            sdf_trunc_m=self.integrate.sdf_trunc_m,
        )

    _raycast_increment_factor: float = 0.8

    def describe(self) -> str:
        """Startup parameter dump (the reference's AppParams::print,
        AppParams.h:104-155)."""
        lines = []
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            lines.append(f"{f.name} = {v}")
        lines.append(f"raycast ray_increment_m = {self.raycast.ray_increment_m}")
        lines.append(f"volume voxel_size_m = {self.volume.voxel_size_m}")
        return "\n".join(lines)


def _get(cp: configparser.ConfigParser, section: str, key: str, default, cast):
    try:
        raw = cp.get(section, key)
    except (configparser.NoSectionError, configparser.NoOptionError):
        return default
    raw = raw.strip()
    if cast is bool:
        return raw not in ("0", "", "false", "False")
    return cast(raw)


def load_ini(path: str) -> AppConfig:
    """Load a reference-format config.ini (sections/keys per
    AppParamsProducer.cpp:18-171 and README_ABOUT_CONFIG)."""
    cp = configparser.ConfigParser(inline_comment_prefixes=("#", ";"))
    with open(path) as f:
        cp.read_string(f.read())

    sw = SwitchConfig(
        use_color=_get(cp, "switch", "use_color", True, bool),
        record_rgbd=_get(cp, "switch", "record_rgbd", False, bool),
        use_dataset_rgbd=_get(cp, "switch", "read_rgbd_from_rgbddataset", False, bool),
        record_trajectory=_get(cp, "switch", "record_trajectory", False, bool),
        use_traj_from_file=_get(cp, "switch", "read_trajactory_from_file", False, bool),
        color_angle_weight=_get(cp, "switch", "color_angle_weight", True, bool),
        use_sdf_tracker=_get(cp, "switch", "use_sdf_tracker", False, bool),
    )
    depth_cam = CameraIntrinsics(
        width=_get(cp, "camera", "depth_cols", 640, int),
        height=_get(cp, "camera", "depth_rows", 480, int),
        cx=_get(cp, "camera", "depth_cx", 319.5, float),
        cy=_get(cp, "camera", "depth_cy", 239.5, float),
        fx=_get(cp, "camera", "depth_fx", 525.0, float),
        fy=_get(cp, "camera", "depth_fy", 525.0, float),
    )
    rgb_cam = CameraIntrinsics(
        width=_get(cp, "camera", "rgb_cols", 640, int),
        height=_get(cp, "camera", "rgb_rows", 480, int),
        cx=_get(cp, "camera", "rgb_cx", 319.5, float),
        cy=_get(cp, "camera", "rgb_cy", 239.5, float),
        fx=_get(cp, "camera", "rgb_fx", 525.0, float),
        fy=_get(cp, "camera", "rgb_fy", 525.0, float),
    )
    pre = DepthPreprocessConfig(
        max_trunc_m=_get(cp, "kinectfusion", "depth_trunc_max", 4.0, float),
        min_trunc_m=_get(cp, "kinectfusion", "depth_trunc_min", 0.3, float),
        sigma_depth=_get(cp, "kinectfusion", "filter_sigma_depth", 0.02, float),
        sigma_pixel=_get(cp, "kinectfusion", "filter_sigma_pixel", 2.0, float),
    )
    vol = VolumeConfig(
        resolution=_get(cp, "kinectfusion", "volume_resolution", 256, int),
        size_m=_get(cp, "kinectfusion", "volume_size_meter", 2.0, float),
        max_weight=_get(cp, "kinectfusion", "volume_max_weight", 128.0, float),
    )
    integ = IntegrateConfig(
        sdf_trunc_m=_get(cp, "kinectfusion", "integrate_sdf_trunc", 0.04, float),
        max_integrate_dist_m=_get(cp, "kinectfusion", "integrate_depth_trunc", 2.0, float),
    )
    icp = IcpConfig(
        pyramid_levels=_get(cp, "icp", "icp_pyramid_level", 3, int),
        dist_thresh_m=_get(cp, "icp", "icp_thre_dist", 0.1, float),
        normal_sin_thresh=_get(cp, "icp", "icp_thre_sin_angle", 0.2, float),
        dist_shake_m=_get(cp, "icp", "camera_shake_dist", 0.4, float),
        angle_shake_rad=_get(cp, "icp", "camera_shake_angle", 0.4, float),
        # deviations from reference behavior are OPT-IN via the [tsdfjax]
        # section: a bit-exact reference config.ini yields strict-parity
        # tracker settings (subsample 1, no early exit)
        source_subsample=_get(cp, "tsdfjax", "icp_source_subsample", 1, int),
        converge_eps=_get(cp, "tsdfjax", "icp_converge_eps", 0.0, float),
        coarse_assoc=bool(_get(cp, "tsdfjax", "icp_coarse_assoc", 0, int)),
    )
    sdf = SdfTrackerConfig(
        max_iters=_get(cp, "sdfTracker", "max_iter_nums", 6, int),
        # the reference hardcodes 1e-3 (CameraPoseFinderSDF.cpp:87-90);
        # the ablation configs tighten it via the [tsdfjax] section
        convergence_eps=_get(cp, "tsdfjax", "sdf_convergence_eps", 1e-3, float),
        dist_shake_m=_get(cp, "sdfTracker", "camera_shake_dist", 0.4, float),
        angle_shake_rad=_get(cp, "sdfTracker", "camera_shake_angle", 0.4, float),
        source_subsample=_get(cp, "tsdfjax", "sdf_source_subsample", 1, int),
        q_oversample=_get(cp, "tsdfjax", "sdf_q_oversample", 1.6, float),
        huber_delta=_get(cp, "tsdfjax", "sdf_huber_delta", 0.0, float),
        hole_aware_gradient=bool(
            _get(cp, "tsdfjax", "sdf_hole_aware_gradient", 0, int)
        ),
        rebuild_assoc_every_iter=bool(
            _get(cp, "tsdfjax", "sdf_rebuild_assoc", 0, int)
        ),
        use_filtered_depth=_get(
            cp, "tsdfjax", "sdf_use_filtered_depth", False, bool
        ),
    )
    mc = MarchingCubesConfig(
        max_triangles=_get(cp, "mesh", "max_triangle_num", 1_500_000, int),
    )
    io = IOConfig(
        mesh_filename=_get(cp, "IO", "mesh_filename", "output/mesh.obj", str),
        rgbd_read_filename=_get(cp, "IO", "rgbd_source_filename", "", str),
        rgbd_write_filename=_get(cp, "IO", "rgbd_record_filename", "", str),
        traj_read_filename=_get(cp, "IO", "trajectory_source_filename", "", str),
        traj_write_filename=_get(cp, "IO", "trajectory_record_filename", "", str),
    )
    return AppConfig(
        switches=sw,
        depth_camera=depth_cam,
        rgb_camera=rgb_cam,
        preprocess=pre,
        volume=vol,
        integrate=integ,
        icp=icp,
        sdf_tracker=sdf,
        marching_cubes=mc,
        io=io,
        _raycast_increment_factor=_get(
            cp, "kinectfusion", "raycast_increment_factor", 0.8, float
        ),
        fast_ops=_get(cp, "tsdfjax", "fast_ops", True, bool),
    )
