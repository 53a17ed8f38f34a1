"""Property tests for the slot packer + plan builders (the host-side code
the pallas kernels trust blindly): randomized meshes, invariant checks,
and native-vs-Python packer equivalence."""

import numpy as np
import pytest

from rdycore_tpu.mesh import structured_quad, structured_tri
from rdycore_tpu.mesh.core import rcm_reorder
from rdycore_tpu.ops.pallas.slotted import (
    GT,
    _slot_pack_py,
    build_slotted_plan,
)


def _random_edges(rng, C, E):
    """Random connected-ish edge set with bounded bandwidth (post-RCM
    shape): |l - r| mostly small, a few long-range edges."""
    il = rng.integers(0, C, E)
    span = np.where(rng.random(E) < 0.9,
                    rng.integers(1, 64, E), rng.integers(1, 512, E))
    ir = np.clip(il + span, 0, C - 1)
    keep = il != ir
    return il[keep].astype(np.int64), ir[keep].astype(np.int64)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("rcap", [8, 16])
def test_packer_invariants_random(seed, rcap):
    rng = np.random.default_rng(seed)
    C, E = 4096, 9000
    il, ir = _random_edges(rng, C, E)
    order = np.argsort(np.minimum(il, ir), kind="stable")
    il, ir = il[order], ir[order]
    slot_row, color, tile_of, ws_rows, need_sup = _slot_pack_py(
        il, ir, max_sup=8, rcap=rcap
    )
    E = len(il)
    ntiles = len(ws_rows)
    # every edge gets a slot; colors within cap; lane caps respected
    assert (color < rcap).all() and (color >= 0).all()
    assert (slot_row >= 0).all() and (slot_row < 8).all()
    assert (np.diff(tile_of) >= 0).all()  # tiles assigned monotonically
    # within a tile: (slot_row, laneL) unique, (color, laneR) unique,
    # (color, laneL) unique (the route constraint)
    laneL = il & 127
    laneR = ir & 127
    keyL = tile_of * (8 * 128) + slot_row * 128 + laneL
    keyR = tile_of * (rcap * 128) + color * 128 + laneR
    keyRL = tile_of * (rcap * 128) + color * 128 + laneL
    assert len(np.unique(keyL)) == E
    assert len(np.unique(keyR)) == E
    assert len(np.unique(keyRL)) == E
    # window budget honored
    hi = np.maximum(il, ir) >> 7
    assert ((hi - ws_rows[tile_of]) < need_sup * 8).all()


@pytest.mark.parametrize("rcap", [8, 16])
def test_native_packer_matches_python(rcap):
    from rdycore_tpu.mesh import native

    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(7)
    il, ir = _random_edges(rng, 4096, 9000)
    order = np.argsort(np.minimum(il, ir), kind="stable")
    il, ir = il[order], ir[order]
    nat = native.slot_pack(il, ir, 8, rcap=rcap)
    py = _slot_pack_py(il, ir, 8, rcap=rcap)
    if nat is None:
        pytest.skip("native slot_pack entry point missing")
    for a, b in zip(nat[:3], py[:3]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(nat[3]), np.asarray(py[3]))
    assert nat[4] == py[4]


@pytest.mark.parametrize("mesh_fn", [
    lambda: rcm_reorder(structured_tri(30, 24)),
    lambda: structured_quad(64, 48),
])
def test_plan_layout_invariants(mesh_fn):
    """The built plan's slot maps must be a bijection onto the real edges
    and tile counts must be GT multiples (the kernels' grid contract)."""
    mesh = mesh_fn()
    from rdycore_tpu.operator import build_operator
    import jax.numpy as jnp

    op = build_operator(mesh, mannings_n=np.zeros(mesh.num_cells),
                        dtype=jnp.float32)
    ha = op.host_arrays
    Ei = op.num_internal_edges
    plan = build_slotted_plan(
        ha["int_left"], ha["int_right"], ha["int_cn"], ha["int_sn"],
        ha["edge_courant_coef"][:Ei], op.num_cells,
    )
    assert plan is not None
    assert plan.ntiles % GT == 0
    assert plan.rrows in (8, 16)
    # eposL/eposR are injective; slot_edge inverts eposL
    assert len(np.unique(plan.eposL)) == Ei
    assert len(np.unique(plan.eposR)) == Ei
    np.testing.assert_array_equal(
        plan.slot_edge[plan.eposL], np.arange(Ei, dtype=np.int32)
    )
    # occupancy: slot_edge >= 0 exactly at occupied L slots (the valid
    # masks were removed — downstream plans carry coef 0 for empty slots)
    assert int((plan.slot_edge >= 0).sum()) == Ei
    # the int8 index planes stay in range
    for arr in (plan.supL, plan.supR, plan.m, plan.g, plan.gi, plan.mi):
        assert arr.dtype == np.int8
        assert arr.min() >= 0


def _native_plan_fns():
    from rdycore_tpu.mesh import native

    return {
        k: getattr(native, k)
        for k in (
            "sort_fold", "fill_slot_planes", "cell_side_stats",
            "cell_side_fill", "cell_side_filter", "coef_extract",
            "remap_ce",
        )
    }


@pytest.mark.parametrize("variant", [
    "unified", "muscl", "hr", "tracers", "tri", "bs2002",
])
def test_native_plan_build_matches_numpy(variant):
    """The native plan-fill fast path (csrc rdy_sort_fold /
    rdy_fill_slot_planes / rdy_cell_side_* / rdy_coef_extract /
    rdy_remap_ce) must be a bitwise twin of the numpy builders across
    every plan flavor: unified boundary folding, MUSCL second order,
    hydrostatic reconstruction, tracers (ndof > 3), triangles, BS2002."""
    from rdycore_tpu.mesh import native
    from rdycore_tpu.operator import build_operator
    from rdycore_tpu.ops.pallas.slotted import to_pallas_backend
    import jax.numpy as jnp

    if not native.available():
        pytest.skip("native lib unavailable")
    real = _native_plan_fns()
    if any(v is None for v in real.values()):
        pytest.skip("native plan entry points missing")

    mesh = (structured_tri(40, 32) if variant in ("tri", "bs2002")
            else structured_quad(48, 40))
    kw = dict(
        muscl=dict(second_order=True),
        hr=dict(well_balancing_hr=True),
        tracers=dict(num_tracers=2),
        bs2002=dict(well_balancing_bs2002=True),
    ).get(variant, {})
    op = build_operator(mesh, mannings_n=np.full(mesh.num_cells, 0.02),
                        dtype=jnp.float32, **kw)

    def run():
        return to_pallas_backend(op)

    try:
        op_native = run()
        for k in real:
            setattr(
                native, k,
                (lambda *a, **kw: False) if k == "fill_slot_planes"
                else (lambda *a, **kw: None),
            )
        op_numpy = run()
    finally:
        for k, v in real.items():
            setattr(native, k, v)

    assert op_native.edge_flux_backend == "pallas"
    assert op_numpy.edge_flux_backend == "pallas"
    fn = dict(zip(op_native.arrays._fields, op_native.arrays))
    fp = dict(zip(op_numpy.arrays._fields, op_numpy.arrays))
    plan_keys = {k for k in fn if k.startswith("pl_")}
    assert plan_keys == {k for k in fp if k.startswith("pl_")}
    check = plan_keys | {
        "int_left", "int_right", "cell_edges", "int_cn", "int_sn",
        "edge_courant_coef",
    }
    for k in sorted(check & set(fn)):
        a, b = fn[k], fp[k]
        if isinstance(a, (tuple, list)):
            continue  # nested aux structures are covered via their pl_ twins
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=f"{variant}:{k}"
        )
