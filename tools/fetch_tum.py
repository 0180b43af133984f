#!/usr/bin/env python
"""Download the TUM RGB-D benchmark sequences used by BASELINE.md.

The reference is evaluated on TUM RGB-D via its recorded trajectory
(README.md:8, TrajectoryRecorder.cpp:14-43); BASELINE.json configs 1-5
name fr1_xyz, fr1_desk, fr2_desk and fr3_long_office_household.

NOTE: this build/bench environment has ZERO network egress (DNS fails),
so these sequences cannot be fetched here. tools/run_baseline.py detects
the missing data and falls back to synthetic TUM-format sequences
rendered by tools/make_tum_synthetic.py — identical directory layout,
identical CLI path — and records that substitution in its output JSON.
Run this script on a networked machine and point run_baseline.py at the
download directory to get real-data ATE numbers.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import tarfile
import urllib.request

BASE = "https://cvg.cit.tum.de/rgbd/dataset"

# (relative url, md5 of the .tgz) — md5s published at
# https://cvg.cit.tum.de/data/datasets/rgbd-dataset/download
SEQUENCES = {
    "fr1_xyz": ("freiburg1/rgbd_dataset_freiburg1_xyz.tgz", None),
    "fr1_desk": ("freiburg1/rgbd_dataset_freiburg1_desk.tgz", None),
    "fr2_desk": ("freiburg2/rgbd_dataset_freiburg2_desk.tgz", None),
    "fr3_long_office": (
        "freiburg3/rgbd_dataset_freiburg3_long_office_household.tgz",
        None,
    ),
}


def fetch(name: str, out_dir: str) -> str:
    rel, md5 = SEQUENCES[name]
    url = f"{BASE}/{rel}"
    tgz = os.path.join(out_dir, os.path.basename(rel))
    os.makedirs(out_dir, exist_ok=True)
    if not os.path.exists(tgz):
        print(f"downloading {url}", file=sys.stderr)
        urllib.request.urlretrieve(url, tgz)
    if md5 is not None:
        digest = hashlib.md5(open(tgz, "rb").read()).hexdigest()
        if digest != md5:
            raise RuntimeError(f"{tgz}: md5 {digest} != expected {md5}")
    with tarfile.open(tgz) as tf:
        tf.extractall(out_dir, filter="data")
    seq_dir = os.path.join(out_dir, os.path.basename(rel).removesuffix(".tgz"))
    print(seq_dir)
    return seq_dir


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sequences", nargs="*", choices=list(SEQUENCES), default=None,
                    help="which sequences (default: all)")
    ap.add_argument("--out", default="data/tum", help="download directory")
    args = ap.parse_args()
    for name in args.sequences or list(SEQUENCES):
        try:
            fetch(name, args.out)
        except OSError as e:
            print(f"FAILED {name}: {e}\n(this environment has no network "
                  "egress — see module docstring)", file=sys.stderr)
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
