"""Benchmark: SWE cell-updates/s on the idealized dam-break case.

The reference's flagship scaling case is the idealized dam break on a
uniform quad grid (docs/user/example-cases/dam-break: 2.88M / 11.5M / 46M /
184M cells); it publishes no absolute numbers (BASELINE.md), so the baseline
here is the per-chip HBM ROOFLINE of the update: the structured-path RHS
reads/writes ~72 B/cell/step in f32 (state 12B r + 12B w, ~4 flux arrays
materialized 24B, sources/geometry ~24B), against ~819 GB/s on TPU v5e
-> ~1.1e10 cell-updates/s/chip ideal; we use 4.0e9 as the practical
baseline (flux arrays + RK bookkeeping make ~200 B/cell realistic).

Modes (env): BENCH_MODE=fused (flagship fused structured Pallas kernel) |
structured (XLA raster path) | pallas (general unstructured slot-routed
Pallas path — realistic .exo-mesh configurations run THIS path) | sharded
(multi-device shard_map over BENCH_SHARDS devices) | sharded_fused
(row-strip-sharded fused kernel over BENCH_SHARDS devices);
BENCH_NX/BENCH_NY/BENCH_STEPS; BENCH_CPU=1 to force CPU.

Default (no BENCH_MODE): orchestrates subprocess runs of the flagship
fused mode AND the pallas / sharded_fused / fused_tracers modes,
reporting the flagship as the headline value with the others alongside
it in the same JSON line. Each mode runs in its own subprocess with its
own timeout; a child death on the in-child watchdog (rc=3) or a
subprocess timeout is the wedged-relay signature — the orchestrator
sleeps ~5 min, health-probes the relay with a tiny matmul, and retries
(up to 2 cycles per mode), because the shared axon relay wedges for
5-10 min after big jobs (BASELINE.md). The fused kernel is ALWAYS
attempted first; structured is only the headline if fused fails through
all recovery cycles. Results are emitted even on SIGTERM.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"[,
"unstructured_value", "unstructured_vs_baseline"]}.
"""

import json
import os
import sys
import time

import numpy as np

# grid-step grouping default for the slotted kernels: GT=16 measures
# consistently faster than the library default 8 at bench scale (BASELINE.md
# GT study); must be set before rdycore_tpu.ops.pallas.slotted is imported
os.environ.setdefault("RDYTPU_GT", "16")

# vs_baseline denominator: the measured throughput of the plain XLA
# structured path on this same chip (1.22e9 cell-updates/s at 2.88M cells,
# BASELINE.md) -- i.e. what a straightforward non-kernel port achieves. The
# reference publishes no absolute numbers (BASELINE.md), so this is the
# self-defined baseline; the practical Pallas target remains ~4e9 (HBM
# roofline ~1.1e10, docstring above).
BASELINE = 1.22e9

_results = {}  # mode -> updates/s, shared with the watchdog handler


def _emit(nx, ny, n_steps, headline):
    """Print the one-line JSON result (headline mode + any extra modes)."""
    if headline not in _results:
        return False
    v = _results[headline]
    out = {
        "metric": f"swe_cell_updates_per_sec_per_chip_{headline}",
        "value": round(v, 1),
        "unit": "cell-updates/s",
        "vs_baseline": round(v / BASELINE, 4),
    }
    if "pallas" in _results and headline != "pallas":
        u = _results["pallas"]
        out["unstructured_value"] = round(u, 1)
        out["unstructured_vs_baseline"] = round(u / BASELINE, 4)
    for extra in ("sharded_fused", "fused_tracers", "fused_muscl"):
        if extra in _results and headline != extra:
            u = _results[extra]
            out[f"{extra}_value"] = round(u, 1)
            out[f"{extra}_vs_baseline"] = round(u / BASELINE, 4)
    print(json.dumps(out))
    return True


def measure(mode, nx, ny, n_steps, dt, cache_dir):
    import jax
    import jax.numpy as jnp

    t_build = time.time()
    if mode == "structured":
        from rdycore_tpu.ops.structured import (
            build_structured_operator,
            make_structured_stepper,
        )

        C = nx * ny
        op = build_structured_operator(
            nx, ny, 0.002, 0.002,
            mannings_n=np.full((ny, nx), 0.015, np.float32),
            dtype=jnp.float32,
        )
        q0 = np.zeros((3, ny, nx), np.float32)
        q0[0, :, : nx // 2] = 10.0
        q0[0, :, nx // 2 :] = 5.0
        q0 = jnp.asarray(q0)
        src = jnp.zeros((3, ny, nx), jnp.float32)
        adv = jax.jit(
            make_structured_stepper(op, "euler"), donate_argnums=(1,)
        )

        def run(q, n):
            q_out, t_out, cmax = adv(op.arrays, q, 0.0, dt, n, 1e9, src)
            return q_out, cmax
    elif mode == "fused":
        from rdycore_tpu.ops.pallas.structured_step import (
            GC,
            GR,
            StructuredPlan,
            make_fused_structured_stepper,
            pad_plane,
        )

        C = nx * ny
        ty = int(os.environ.get("BENCH_TY", 64))
        plan = StructuredPlan(
            nx=nx, ny=ny, dx=0.002, dy=0.002, tiny_h=1e-7, h_anuga=0.0,
            bc_left=1, bc_right=1, bc_bottom=1, bc_top=1,  # reflecting
            gr=ty,
        )
        geo_const = bool(os.environ.get("BENCH_GEO_CONST"))
        zeros = np.zeros((ny, nx), np.float32)
        mann2d = np.full((ny, nx), 0.015, np.float32)
        adv = jax.jit(
            make_fused_structured_stepper(
                plan, zeros if geo_const else None,
                zeros if geo_const else None,
                mann2d if geo_const else None,
            ),
            static_argnums=(),
            donate_argnums=(0, 1, 2),
        )
        h0 = np.zeros((ny, nx), np.float32)
        h0[:, : nx // 2] = 10.0
        h0[:, nx // 2 :] = 5.0
        hp = jnp.asarray(pad_plane(h0, ty))
        zpln = np.zeros((ny, nx), np.float32)
        # geometry planes as runtime args (NOT closure constants): at 184M
        # cells, baked constants inflate the program body past what the
        # remote-compile relay accepts. They must be distinct buffers from
        # the (donated) state planes.
        zgeo = jnp.asarray(pad_plane(zpln, ty))
        dzx_a = zgeo
        dzy_a = zgeo
        mann_a = jnp.asarray(pad_plane(mann2d, ty))
        q0 = (hp, jnp.asarray(pad_plane(zpln, ty)),
              jnp.asarray(pad_plane(zpln, ty)))

        if geo_const:
            def run(state, n):
                h, hu, hv = state
                h, hu, hv, t, cmax = adv(h, hu, hv, 0.0, dt, n, 1e9)
                return (h, hu, hv), cmax
        else:
            def run(state, n):
                h, hu, hv = state
                h, hu, hv, t, cmax = adv(
                    h, hu, hv, 0.0, dt, n, 1e9, dzx_a, dzy_a, mann_a
                )
                return (h, hu, hv), cmax
    elif mode == "fused_muscl":
        # flagship kernel with MUSCL second order in-kernel (LS gradients,
        # limited reconstruction, Audusse positivity) — the accurate
        # production configuration at raster-kernel throughput (round 4)
        from rdycore_tpu.ops.pallas.structured_step import (
            StructuredPlan,
            make_fused_structured_stepper,
            pad_plane,
        )

        C = nx * ny
        ty = int(os.environ.get("BENCH_TY", 64))
        plan = StructuredPlan(
            nx=nx, ny=ny, dx=0.002, dy=0.002, tiny_h=1e-7, h_anuga=0.0,
            bc_left=1, bc_right=1, bc_bottom=1, bc_top=1, gr=ty,
        )
        mann2d = np.full((ny, nx), 0.015, np.float32)
        adv = jax.jit(
            make_fused_structured_stepper(
                plan, None, None, None, scheme="ssprk2", second_order=True,
            ),
            donate_argnums=(0, 1, 2),
        )
        h0 = np.zeros((ny, nx), np.float32)
        h0[:, : nx // 2] = 10.0
        h0[:, nx // 2 :] = 5.0
        zpln = np.zeros((ny, nx), np.float32)
        zgeo = jnp.asarray(pad_plane(zpln, ty))
        dzx_a, dzy_a = zgeo, zgeo
        mann_a = jnp.asarray(pad_plane(mann2d, ty))
        q0 = (jnp.asarray(pad_plane(h0, ty)),
              jnp.asarray(pad_plane(zpln, ty)),
              jnp.asarray(pad_plane(zpln, ty)))

        def run(state, n):
            h, hu, hv = state
            h, hu, hv, t, cmax = adv(
                h, hu, hv, 0.0, dt, n, 1e9, dzx_a, dzy_a, mann_a
            )
            return (h, hu, hv), cmax
    elif mode == "fused_tracers":
        # flagship kernel with in-kernel tracer advection (1 sediment +
        # 1 passive): the Houston/Harvey-class rain+sediment physics at
        # raster-kernel throughput (VERDICT r3 #5)
        from rdycore_tpu.ops.pallas.structured_step import (
            StructuredPlan,
            make_fused_structured_stepper,
            pad_plane,
        )

        C = nx * ny
        nt = int(os.environ.get("BENCH_NT", 2))
        ty = int(os.environ.get("BENCH_TY", 64))
        plan = StructuredPlan(
            nx=nx, ny=ny, dx=0.002, dy=0.002, tiny_h=1e-7, h_anuga=0.0,
            bc_left=1, bc_right=1, bc_bottom=1, bc_top=1, gr=ty,
        )
        mann2d = np.full((ny, nx), 0.015, np.float32)
        adv = jax.jit(
            make_fused_structured_stepper(
                plan, None, None, None, num_tracers=nt, num_sediment=1,
            ),
            donate_argnums=(0, 1, 2),
        )
        h0 = np.zeros((ny, nx), np.float32)
        h0[:, : nx // 2] = 10.0
        h0[:, nx // 2 :] = 5.0
        zpln = np.zeros((ny, nx), np.float32)
        zgeo = jnp.asarray(pad_plane(zpln, ty))
        dzx_a, dzy_a = zgeo, zgeo
        mann_a = jnp.asarray(pad_plane(mann2d, ty))
        hc0 = jnp.stack(
            [jnp.asarray(pad_plane(0.01 * h0, ty)) for _ in range(nt)]
        )
        q0 = (jnp.asarray(pad_plane(h0, ty)),
              jnp.asarray(pad_plane(zpln, ty)),
              jnp.asarray(pad_plane(zpln, ty)), hc0)

        def run(state, n):
            h, hu, hv, hc = state
            h, hu, hv, hc, t, cmax = adv(
                h, hu, hv, 0.0, dt, n, 1e9, dzx_a, dzy_a, mann_a, hc=hc
            )
            return (h, hu, hv, hc), cmax
    elif mode == "pallas":
        from rdycore_tpu.mesh import structured_quad
        from rdycore_tpu.operator import build_operator
        from rdycore_tpu.ops.pallas.slotted import to_pallas_backend
        from rdycore_tpu.timestepping import make_interval_advancer

        mesh = structured_quad(nx, ny, 0.0, nx * 0.002, 0.0, ny * 0.002)
        C = mesh.num_cells
        op = build_operator(mesh, mannings_n=np.full(C, 0.015), dtype=jnp.float32)
        ms_env = os.environ.get("BENCH_MAX_SUP")
        op = to_pallas_backend(
            op,
            max_sup=int(ms_env) if ms_env else None,  # None = auto-escalate
            max_sup_cd=int(os.environ.get("BENCH_MAX_SUP_CD", 16)),
        )
        assert op.edge_flux_backend == "pallas", "pallas plan failed"
        q0 = np.zeros((3, C), np.float32)
        q0[0] = np.where(mesh.cell_centroid[:, 0] < nx * 0.001, 10.0, 5.0)
        q0 = jnp.asarray(q0)
        bv = jnp.zeros((3, op.num_boundary_edges), jnp.float32)
        src = jnp.zeros((3, C), jnp.float32)
        adv = jax.jit(
            make_interval_advancer(
                op, "euler", accumulate=False, ext_sources=False
            ),
            donate_argnums=(1,),
        )

        def run(q, n):
            res = adv(op.arrays, q, 0.0, dt, n, 1e9, bv, src)
            return res.q, res.max_courant
    elif mode == "sharded_fused":
        from jax.sharding import Mesh as DeviceMesh, NamedSharding
        from jax.sharding import PartitionSpec as P

        from rdycore_tpu.ops.pallas.structured_step import (
            StructuredPlan,
            make_sharded_fused_structured_stepper,
            pad_plane_sharded,
            unshard_plane,
        )

        C = nx * ny
        ty = int(os.environ.get("BENCH_TY", 64))
        n_shards = int(os.environ.get("BENCH_SHARDS", len(jax.devices())))
        plan = StructuredPlan(
            nx=nx, ny=ny, dx=0.002, dy=0.002, tiny_h=1e-7, h_anuga=0.0,
            bc_left=1, bc_right=1, bc_bottom=1, bc_top=1, gr=ty,
        )
        dm = DeviceMesh(np.array(jax.devices()[:n_shards]), ("y",))
        adv = make_sharded_fused_structured_stepper(plan, dm, scheme="euler")
        sh = NamedSharding(dm, P("y", None, None))
        h0 = np.zeros((ny, nx), np.float32)
        h0[:, : nx // 2] = 10.0
        h0[:, nx // 2 :] = 5.0
        zero = np.zeros((ny, nx), np.float32)
        mann2d = np.full((ny, nx), 0.015, np.float32)
        pack = lambda x: jax.device_put(
            jnp.asarray(pad_plane_sharded(x, n_shards, ty)), sh
        )
        dzx_a, dzy_a, mann_a = pack(zero), pack(zero), pack(mann2d)
        q0 = (pack(h0), pack(zero), pack(zero))

        def run(state, n):
            h, hu, hv = state
            h, hu, hv, t, cmax = adv(
                h, hu, hv, 0.0, dt, n, 1e9, dzx_a, dzy_a, mann_a
            )
            return (h, hu, hv), cmax
    elif mode == "sharded":
        from jax.sharding import Mesh as DeviceMesh

        from rdycore_tpu.mesh import structured_quad
        from rdycore_tpu.parallel.sharded import ShardedSWE

        n_shards = int(os.environ.get("BENCH_SHARDS", len(jax.devices())))
        mesh = structured_quad(nx, ny, 0.0, nx * 0.002, 0.0, ny * 0.002)
        C = mesh.num_cells
        sh = ShardedSWE(
            mesh, n_shards, mannings_n=np.full(C, 0.015), dtype=jnp.float32
        )
        dm = DeviceMesh(np.array(jax.devices()[:n_shards]), ("mesh",))
        adv = sh.make_interval_fn(dm, "euler")
        q0 = np.zeros((3, C), np.float32)
        q0[0] = np.where(mesh.cell_centroid[:, 0] < nx * 0.001, 10.0, 5.0)
        qs = sh.scatter_state(q0)
        bv = jnp.zeros((3, max(sh.ref_op.num_boundary_edges, 1)), jnp.float32)
        es = jnp.zeros((n_shards, 3, sh.C_loc), jnp.float32)
        q0 = qs

        def run(q, n):
            q_out, t_out, cmax, _ = adv(q, 0.0, dt, n, 1e9, bv, es)
            return q_out, cmax
    else:  # plain XLA unstructured gather path
        from rdycore_tpu.mesh import structured_quad
        from rdycore_tpu.operator import build_operator
        from rdycore_tpu.timestepping import make_interval_advancer

        mesh = structured_quad(nx, ny, 0.0, nx * 0.002, 0.0, ny * 0.002)
        C = mesh.num_cells
        op = build_operator(mesh, mannings_n=np.full(C, 0.015), dtype=jnp.float32)
        q0 = np.zeros((3, C), np.float32)
        q0[0] = np.where(mesh.cell_centroid[:, 0] < nx * 0.001, 10.0, 5.0)
        q0 = jnp.asarray(q0)
        bv = jnp.zeros((3, op.num_boundary_edges), jnp.float32)
        src = jnp.zeros((3, C), jnp.float32)
        adv = jax.jit(
            make_interval_advancer(op, "euler", accumulate=False),
            donate_argnums=(1,),
        )

        def run(q, n):
            res = adv(op.arrays, q, 0.0, dt, n, 1e9, bv, src)
            return res.q, res.max_courant

    build_s = time.time() - t_build

    def peek(q):
        arr = q[0] if isinstance(q, tuple) else q
        return np.asarray(arr.ravel()[:8])

    def finite(q):
        arr = q[0] if isinstance(q, tuple) else q
        if mode in ("fused", "fused_tracers", "fused_muscl"):
            ty = int(os.environ.get("BENCH_TY", 64))

            return np.isfinite(np.asarray(arr)[ty:-ty, 64:-64]).all()
        if mode == "sharded_fused":
            from rdycore_tpu.ops.pallas.structured_step import unshard_plane

            ty = int(os.environ.get("BENCH_TY", 64))
            return np.isfinite(unshard_plane(np.asarray(arr), ty)).all()
        return np.isfinite(np.asarray(arr)).all()

    # warm-up/compile (the reference uses -preload similarly)
    t0 = time.time()
    q, cmax = run(q0, 3)
    _ = peek(q)  # force execution + device->host transfer
    compile_s = time.time() - t0

    t0 = time.time()
    q, cmax = run(q, n_steps)
    _ = peek(q)
    elapsed = time.time() - t0

    if os.environ.get("RDYTPU_FUSED_ABLATE"):
        # ablated kernels compute intentionally-wrong physics that can
        # blow up over the interval; the timing is still the measurement
        if not finite(q):
            print("# (ablated run non-finite, as expected)", file=sys.stderr)
    else:
        assert finite(q), "bench produced non-finite state"

    updates_per_s = n_steps * C / elapsed
    print(
        f"# mode={mode} mesh {nx}x{ny} = {C} cells, {n_steps} steps in "
        f"{elapsed:.3f}s (compile {compile_s:.1f}s, build {build_s:.1f}s), "
        f"max_courant={float(cmax):.3f}",
        file=sys.stderr,
    )
    return updates_per_s


def run_single_mode(mode, nx, ny, n_steps, dt, cache_dir):
    """Child / explicit-mode path: measure one mode in this process."""
    # watchdog: the axon TPU relay can wedge (remote-compile service
    # outages); die loudly instead of hanging the driver. The orchestrator
    # applies its own subprocess timeout on top of this.
    import signal

    def _timeout(signum, frame):
        print("# bench watchdog expired (TPU relay hung?)", file=sys.stderr)
        os._exit(3)

    signal.signal(signal.SIGALRM, _timeout)
    signal.alarm(int(os.environ.get("BENCH_TIMEOUT", 540)))

    import jax

    if os.environ.get("BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    # persistent compilation cache: the axon remote-compile service is
    # intermittently slow/wedged; once a size compiles, later runs reuse it
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    v = measure(mode, nx, ny, n_steps, dt, cache_dir)
    if os.environ.get("BENCH_CHILD"):
        # machine-readable line for the orchestrator (stderr keeps the
        # human-readable diagnostics)
        print(json.dumps({"mode": mode, "updates_per_s": v}))
    else:
        _results[mode] = v
        _emit(nx, ny, n_steps, mode)


def _run_child(mode, timeout_s):
    """Run one bench mode in a subprocess; return (updates/s | None, rc).

    Isolation matters: the shared axon TPU worker intermittently crashes
    when a large interval executable runs right after another big job
    (BASELINE.md) — the identical program then passes on the restarted
    worker. A subprocess boundary per mode turns that flakiness into a
    retryable event instead of a lost headline. rc == 3 is the in-child
    watchdog (wedged-relay signature); rc == "timeout" is our own kill.
    """
    import subprocess

    env = dict(os.environ, BENCH_MODE=mode, BENCH_CHILD="1",
               BENCH_TIMEOUT=str(int(timeout_s)))
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, stdout=subprocess.PIPE, timeout=timeout_s + 30,
        )
    except subprocess.TimeoutExpired:
        print(f"# mode {mode}: subprocess timeout ({timeout_s:.0f}s)",
              file=sys.stderr)
        return None, "timeout"
    for line in proc.stdout.decode(errors="replace").splitlines():
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if rec.get("mode") == mode and "updates_per_s" in rec:
            return float(rec["updates_per_s"]), 0
    print(f"# mode {mode}: subprocess exited rc={proc.returncode} "
          "without a result", file=sys.stderr)
    return None, proc.returncode


def _probe_relay(timeout_s=110):
    """True iff a tiny matmul completes on the device within timeout_s.

    The axon relay wedges HARD after big jobs — even a cached 256x256
    matmul then hangs >100 s; the only cure is waiting ~5-10 min
    (BASELINE.md). This is the cheap health check between retry cycles.
    """
    import subprocess

    code = (
        "import jax, jax.numpy as jnp;"
        "x = jnp.ones((256, 256), jnp.float32);"
        "print(float((x @ x).sum()))"
    )
    env = {k: v for k, v in os.environ.items()
           if k not in ("BENCH_MODE", "BENCH_CHILD")}
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], env=env,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            timeout=timeout_s,
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _run_mode_resilient(mode, cap, deadline, recovery_cycles=2):
    """Run a mode, surviving the wedged-relay failure signature.

    A child death on the watchdog (rc=3) or a subprocess timeout means
    the shared relay is wedged, not that the kernel is broken — the
    documented recovery is waiting 5-10 min and re-probing with a tiny
    matmul (BASELINE.md). Sleep ~5 min, probe, retry — up to
    `recovery_cycles` times, bounded by the overall deadline.
    """
    def budget():
        return max(60.0, min(cap, deadline - time.time()))

    v, rc = _run_child(mode, budget())
    cycles = 0
    while v is None and cycles < recovery_cycles:
        cycles += 1
        if time.time() > deadline - 120:
            print(f"# mode {mode}: deadline reached, giving up",
                  file=sys.stderr)
            return None
        if rc in (3, "timeout"):
            # wedged-relay signature: wait it out, then health-probe
            wait = min(300.0, max(60.0, deadline - time.time() - 180))
            print(f"# mode {mode}: wedged-relay signature (rc={rc}); "
                  f"sleeping {wait:.0f}s before re-probe "
                  f"(cycle {cycles}/{recovery_cycles})", file=sys.stderr)
            time.sleep(wait)
            t_probe = time.time()
            while not _probe_relay():
                if time.time() > deadline - 180 or \
                        time.time() - t_probe > 600:
                    print(f"# mode {mode}: relay still wedged after "
                          "probing; giving up", file=sys.stderr)
                    return None
                print("# relay probe failed; sleeping 120s", file=sys.stderr)
                time.sleep(120)
            print(f"# relay healthy again; retrying {mode}", file=sys.stderr)
        else:
            print(f"# mode {mode}: non-relay failure (rc={rc}); "
                  "one plain retry", file=sys.stderr)
        v, rc = _run_child(mode, budget())
    return v


def orchestrate(nx, ny, n_steps):
    """Default path: fused headline + pallas/sharded_fused/fused_tracers
    secondaries, each isolated in its own subprocess and retried through
    wedged-relay windows.

    The fused flagship kernel is ALWAYS attempted first (round-2 lesson:
    gating it on a .jax_cache marker file silently demoted the official
    number to the slow mode). structured becomes the headline only if
    fused fails through all recovery cycles. Round-4 lesson: the official
    BENCH_r04.json lost 3 of 4 modes to a wedged-relay window — results
    are now recorded incrementally and emitted even on SIGTERM, so a
    driver kill mid-orchestration still yields a complete-so-far artifact.
    """
    import signal

    nonlocal_headline = ["fused"]

    def _emit_and_die(signum, frame):
        hl = nonlocal_headline[0]
        if hl not in _results:
            for alt in ("fused", "structured", "pallas", "sharded_fused"):
                if alt in _results:
                    hl = alt
                    break
        _emit(nx, ny, n_steps, hl)
        sys.stdout.flush()
        os._exit(0 if hl in _results else 3)

    signal.signal(signal.SIGTERM, _emit_and_die)
    signal.signal(signal.SIGINT, _emit_and_die)

    deadline = time.time() + int(os.environ.get("BENCH_TIMEOUT", 3300))

    headline = "fused"
    v = _run_mode_resilient("fused", 420, deadline)
    if v is None:
        headline = "structured"
        nonlocal_headline[0] = headline
        v = _run_mode_resilient("structured", 300, deadline,
                                recovery_cycles=1)
        if v is None:
            print("# no headline result", file=sys.stderr)
            sys.exit(3)
    _results[headline] = v

    for mode, cap in (("pallas", 360), ("sharded_fused", 300),
                      ("fused_tracers", 300)):
        if time.time() > deadline - 150:
            print(f"# skipping {mode}: deadline", file=sys.stderr)
            continue
        u = _run_mode_resilient(mode, cap, deadline)
        if u is not None:
            _results[mode] = u

    # fused MUSCL second order (round 5: the Mosaic lowering crash is
    # fixed — iota-derived masks are now built at consumption shape)
    if time.time() < deadline - 150:
        u = _run_mode_resilient("fused_muscl", 300, deadline,
                                recovery_cycles=1)
        if u is not None:
            _results["fused_muscl"] = u

    _emit(nx, ny, n_steps, headline)


def main():
    nx = int(os.environ.get("BENCH_NX", 2048))
    ny = int(os.environ.get("BENCH_NY", 1408))
    n_steps = int(os.environ.get("BENCH_STEPS", 500))
    dt = 5e-5  # stable for dx = 2 mm, h <= 10 m (c ~ 10 m/s)

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    mode_env = os.environ.get("BENCH_MODE")
    if mode_env:
        run_single_mode(mode_env, nx, ny, n_steps, dt, cache_dir)
    else:
        orchestrate(nx, ny, n_steps)


if __name__ == "__main__":
    main()
