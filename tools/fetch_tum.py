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

# Relative .tgz urls. Expected md5s CANNOT be pre-filled from this
# environment (zero egress — fabricating them would defeat the check);
# instead the first successful download records each archive's md5 to
# <out>/checksums.md5, and every later fetch verifies against that file.
# Post-extract, the sequence is validated STRUCTURALLY (required TUM
# files present and non-trivial), which catches truncated downloads.
SEQUENCES = {
    "fr1_xyz": "freiburg1/rgbd_dataset_freiburg1_xyz.tgz",
    "fr1_desk": "freiburg1/rgbd_dataset_freiburg1_desk.tgz",
    "fr2_desk": "freiburg2/rgbd_dataset_freiburg2_desk.tgz",
    "fr3_long_office":
        "freiburg3/rgbd_dataset_freiburg3_long_office_household.tgz",
}


def _checksum_file(out_dir: str) -> str:
    return os.path.join(out_dir, "checksums.md5")


def _verify_or_record_md5(tgz: str, out_dir: str) -> None:
    digest = hashlib.md5(open(tgz, "rb").read()).hexdigest()
    name = os.path.basename(tgz)
    path = _checksum_file(out_dir)
    known = {}
    if os.path.exists(path):
        for line in open(path):
            h, fn = line.split()
            known[fn] = h
    if name in known:
        if known[name] != digest:
            raise RuntimeError(
                f"{tgz}: md5 {digest} != recorded {known[name]} "
                f"(delete {path} to re-trust)"
            )
    else:
        with open(path, "a") as f:
            f.write(f"{digest}  {name}\n")
        print(f"recorded md5 {digest} for {name}", file=sys.stderr)


def _validate_sequence(seq_dir: str) -> None:
    """Structural integrity: the TUM files run_baseline.py consumes."""
    for req in ("depth.txt", "rgb.txt", "groundtruth.txt"):
        p = os.path.join(seq_dir, req)
        if not os.path.exists(p):
            raise RuntimeError(f"{seq_dir}: missing {req} after extract")
        n = sum(1 for l in open(p) if not l.startswith("#"))
        if n < 100:
            raise RuntimeError(f"{seq_dir}/{req}: only {n} entries — "
                               "truncated download?")
    if not os.listdir(os.path.join(seq_dir, "depth")):
        raise RuntimeError(f"{seq_dir}/depth: empty")


def fetch(name: str, out_dir: str) -> str:
    rel = SEQUENCES[name]
    url = f"{BASE}/{rel}"
    tgz = os.path.join(out_dir, os.path.basename(rel))
    os.makedirs(out_dir, exist_ok=True)
    if not os.path.exists(tgz):
        print(f"downloading {url}", file=sys.stderr)
        urllib.request.urlretrieve(url, tgz)
    _verify_or_record_md5(tgz, out_dir)
    with tarfile.open(tgz) as tf:
        tf.extractall(out_dir, filter="data")
    seq_dir = os.path.join(out_dir, os.path.basename(rel).removesuffix(".tgz"))
    _validate_sequence(seq_dir)
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
