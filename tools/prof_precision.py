#!/usr/bin/env python
"""Probe the active backend's f32 matmul accuracy under the package's
default precision (tsdfjax sets jax_default_matmul_precision=highest).

Prints max abs error vs float64 numpy for (N,3)@(3,3) point transforms
and a composed 4x4 pose chain — the two geometric shapes that destroyed
on-chip tracking when the MXU ran them at bf16 precision.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

import tsdfjax  # noqa: F401  (sets the matmul precision default)
import jax
import jax.numpy as jnp


def main() -> int:
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 1, (200_000, 3)).astype(np.float32)
    r = np.linalg.qr(rng.normal(0, 1, (3, 3)))[0].astype(np.float32)

    got = np.asarray(jax.jit(lambda a, b: a @ b.T)(jnp.asarray(pts), jnp.asarray(r)))
    want = pts.astype(np.float64) @ r.astype(np.float64).T
    e1 = float(np.abs(got - want).max())

    mats = rng.normal(0, 0.1, (64, 4, 4)).astype(np.float32) + np.eye(4, dtype=np.float32)

    @jax.jit
    def chain(ms):
        def body(c, m):
            return m @ c, None
        out, _ = jax.lax.scan(body, jnp.eye(4), ms)
        return out

    got4 = np.asarray(chain(jnp.asarray(mats)))
    want4 = np.eye(4)
    for m in mats:
        want4 = m.astype(np.float64) @ want4
    e2 = float(np.abs(got4 - want4).max())

    print(f"backend={jax.default_backend()} "
          f"precision={jax.config.jax_default_matmul_precision}")
    print(f"points@R.T  max_err {e1:.3e}   (f32 rounding ~1e-6; bf16 ~1e-2)")
    print(f"4x4 chain   max_err {e2:.3e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
