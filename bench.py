"""Benchmark: SWE cell-updates/s on the idealized dam-break case.

The reference's flagship scaling case is the idealized dam break
(docs/user/example-cases/dam-break: 2.88M / 11.5M / 46M / 184M cells); it
publishes no absolute numbers (BASELINE.md), so the baseline here is the
per-chip memory-bandwidth ROOFLINE of the edge-flux + source kernel: the
update is gather/scatter memory-bound, ~208 bytes/cell-update in f32
(2 edges/cell x [2x3x4B state reads + 16B geometry + 16B flux/amax writes]
+ 4x3x4B cell gather + 36B state/rhs/source traffic), against ~819 GB/s HBM
on TPU v5e -> ~3.9e9 cell-updates/s/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    if os.environ.get("BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rdycore_tpu.mesh import structured_quad
    from rdycore_tpu.operator import build_operator
    from rdycore_tpu.timestepping import make_interval_advancer

    # dam-break mesh rung (reference ladder starts at 2,883,584 = 2048x1408);
    # sized to keep bench wall time modest while being firmly memory-bound
    nx, ny = int(os.environ.get("BENCH_NX", 2048)), int(os.environ.get("BENCH_NY", 1408))
    n_steps = int(os.environ.get("BENCH_STEPS", 100))

    t_build = time.time()
    mesh = structured_quad(nx, ny, 0.0, nx * 0.002, 0.0, ny * 0.002)
    C = mesh.num_cells
    op = build_operator(
        mesh, mannings_n=np.full(C, 0.015), dtype=jnp.float32
    )
    build_s = time.time() - t_build

    q0 = np.zeros((3, C), np.float32)
    q0[0] = np.where(mesh.cell_centroid[:, 0] < nx * 0.001, 10.0, 5.0)
    q0 = jnp.asarray(q0)

    dt = 5e-5  # stable for dx=2mm, h<=10m (c ~ 10 m/s)
    adv = jax.jit(make_interval_advancer(op, "euler"))
    bv = jnp.zeros((3, op.num_boundary_edges), jnp.float32)
    src = jnp.zeros((3, C), jnp.float32)

    # warm-up/compile (the reference uses -preload for the same reason,
    # rdyadvance.c:240-257)
    t0 = time.time()
    res = adv(op.arrays, q0, 0.0, dt, 3, 1e9, bv, src)
    _ = np.asarray(res.q[0, :8])  # force full execution + transfer
    compile_s = time.time() - t0

    # timed run
    t0 = time.time()
    res = adv(op.arrays, res.q, 0.0, dt, n_steps, 1e9, bv, src)
    _ = np.asarray(res.q[0, :8])
    elapsed = time.time() - t0

    assert np.isfinite(np.asarray(res.q)).all(), "bench produced non-finite state"

    updates_per_s = n_steps * C / elapsed
    roofline = 3.9e9  # cell-updates/s/chip on v5e (see module docstring)
    out = {
        "metric": "swe_cell_updates_per_sec_per_chip",
        "value": round(updates_per_s, 1),
        "unit": "cell-updates/s",
        "vs_baseline": round(updates_per_s / roofline, 4),
    }
    print(json.dumps(out))
    print(
        f"# mesh {nx}x{ny} = {C} cells, {n_steps} steps in {elapsed:.3f}s "
        f"(compile {compile_s:.1f}s, mesh build {build_s:.1f}s), "
        f"max_courant={float(res.max_courant):.3f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
