"""Scaling study: cell-updates/s across device counts.

Weak or strong scaling of the sharded SWE stepper over however many
devices are visible (real chips on a pod slice; virtual CPU devices for
plumbing validation). Prints one JSON line per device count.

Usage:
  python scaling.py                     # strong scaling, default mesh
  SCALING_MODE=weak python scaling.py   # weak scaling (cells ~ devices)
  SCALING_NX/SCALING_NY, SCALING_STEPS, SCALING_CPU=1 as in bench.py
"""

import json
import os
import sys
import time

import numpy as np


def run_case(n_devices, nx, ny, n_steps):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh as DeviceMesh

    from rdycore_tpu.mesh import structured_quad
    from rdycore_tpu.parallel.sharded import ShardedSWE

    mesh = structured_quad(nx, ny, 0.0, nx * 0.002, 0.0, ny * 0.002)
    C = mesh.num_cells
    sh = ShardedSWE(
        mesh, n_devices, mannings_n=np.full(C, 0.015), dtype=jnp.float32
    )
    dm = DeviceMesh(np.array(jax.devices()[:n_devices]), ("mesh",))
    adv = sh.make_interval_fn(dm, "euler")
    q0 = np.zeros((3, C), np.float32)
    q0[0] = np.where(mesh.cell_centroid[:, 0] < nx * 0.001, 10.0, 5.0)
    qs = sh.scatter_state(q0)
    bv = jnp.zeros((3, max(sh.ref_op.num_boundary_edges, 1)), jnp.float32)
    es = jnp.zeros((n_devices, 3, sh.C_loc), jnp.float32)
    dt = 5e-5

    q, _, _, _ = adv(qs, 0.0, dt, 3, 1e9, bv, es)  # warm-up/compile
    _ = np.asarray(q.ravel()[:4])
    t0 = time.time()
    q, _, cmax, _ = adv(q, 0.0, dt, n_steps, 1e9, bv, es)
    _ = np.asarray(q.ravel()[:4])
    elapsed = time.time() - t0
    assert np.isfinite(np.asarray(q[0, :, : sh.B])).all()
    return C, n_steps * C / elapsed, sh.neighbor_only


def main():
    if os.environ.get("SCALING_CPU"):
        # virtual CPU devices for plumbing validation; must be in XLA_FLAGS
        # before the backend initializes
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count="
                + os.environ.get("SCALING_DEVICES", "8")
            ).strip()

    import jax

    if os.environ.get("SCALING_CPU"):
        jax.config.update("jax_platforms", "cpu")
    mode = os.environ.get("SCALING_MODE", "strong")
    nx = int(os.environ.get("SCALING_NX", 512))
    ny = int(os.environ.get("SCALING_NY", 512))
    n_steps = int(os.environ.get("SCALING_STEPS", 50))

    n_avail = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    base = None
    for n in counts:
        if mode == "weak":
            C, ups, nbr = run_case(n, nx, ny * n, n_steps)
        else:
            C, ups, nbr = run_case(n, nx, ny, n_steps)
        if base is None:
            base = ups / n if mode == "weak" else ups
        eff = (ups / n) / base if mode == "weak" else ups / (base * n)
        print(
            json.dumps(
                {
                    "devices": n,
                    "cells": C,
                    "cell_updates_per_s": round(ups, 1),
                    "efficiency": round(eff, 4),
                    "halo": "ppermute" if nbr else "all_gather",
                    "mode": mode,
                }
            )
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
