"""Camera pose trackers: frame-to-model point-to-plane ICP, direct SDF
(Bylow-style), and ground-truth playback (host side in tsdfjax.io.tum)."""

from tsdfjax.trackers.icp import icp_track
from tsdfjax.trackers.sdf import sdf_track
