"""Mesh construction tests (the analogue of the reference's test_rdymesh.c,
which builds the FV mesh from planar_dam_10x5.msh)."""

import numpy as np

from rdycore_tpu.mesh import (
    read_gmsh,
    refine_uniform,
    structured_quad,
    structured_tri,
)

MESH = "/root/reference/share/meshes/planar_dam_10x5.msh"


def test_structured_quad_counts():
    m = structured_quad(4, 3, 0, 4, 0, 3)
    assert m.num_cells == 12
    assert m.num_edges == 31  # 16 horizontal + 15 vertical
    assert m.num_internal_edges == 17
    assert np.allclose(m.cell_area, 1.0)
    assert np.allclose(m.edge_cn**2 + m.edge_sn**2, 1.0)


def test_edge_signs_consistent():
    m = structured_quad(5, 4)
    sig = np.zeros(m.num_edges + 1)
    np.add.at(sig, m.cell_edges, m.cell_edge_sign)
    # internal edges appear once with +1 and once with -1
    assert np.all(sig[: m.num_internal_edges] == 0.0)
    # boundary edges appear only as left (-1)
    assert np.all(sig[m.num_internal_edges : m.num_edges] == -1.0)


def test_outward_normals_on_boundary():
    m = structured_quad(3, 3, 0, 3, 0, 3)
    for name, expect in [
        ("left", (-1.0, 0.0)),
        ("right", (1.0, 0.0)),
        ("bottom", (0.0, -1.0)),
        ("top", (0.0, 1.0)),
    ]:
        eids = m.boundaries[name]
        assert np.allclose(m.edge_cn[eids], expect[0])
        assert np.allclose(m.edge_sn[eids], expect[1])


def test_gmsh_reference_mesh():
    m = read_gmsh(MESH)
    assert m.num_cells == 44
    assert len(m.regions["upstream"]) + len(m.regions["downstream"]) == 44
    assert set(m.boundaries) >= {"boundary", "top_wall", "bottom_wall"}
    # total domain area: the planar dam geometry is a 10x5 rectangle minus
    # the dam walls; cells are unit quads
    assert m.cell_area.sum() == 44.0
    # id-aliased lookups for grid_boundary_id-based config
    assert np.array_equal(m.boundaries["__id_2"], m.boundaries["top_wall"])


def test_bed_slope_plane():
    # z = 0.3 x + 0.7 y must give exact constant slopes
    m = structured_quad(6, 5, z_fn=lambda x, y: 0.3 * x + 0.7 * y)
    assert np.allclose(m.cell_dz_dx, 0.3)
    assert np.allclose(m.cell_dz_dy, 0.7)
    mt = structured_tri(6, 5, z_fn=lambda x, y: 0.3 * x + 0.7 * y)
    assert np.allclose(mt.cell_dz_dx, 0.3)
    assert np.allclose(mt.cell_dz_dy, 0.7)


def test_refinement_preserves_area_and_labels():
    m = structured_quad(4, 3, 0, 4, 0, 3)
    r = refine_uniform(m, 2)
    assert r.num_cells == 12 * 16
    assert np.isclose(r.cell_area.sum(), m.cell_area.sum())
    assert len(r.boundaries["left"]) == 4 * len(m.boundaries["left"])

    mt = structured_tri(4, 3)
    rt = refine_uniform(mt, 1)
    assert rt.num_cells == mt.num_cells * 4
    assert np.isclose(rt.cell_area.sum(), mt.cell_area.sum())


def test_native_matches_numpy_edge_extraction():
    from rdycore_tpu.mesh import native
    from rdycore_tpu.mesh.core import _extract_edges_numpy

    if not native.available():
        import pytest

        pytest.skip("native mesh library unavailable")
    m = read_gmsh(MESH)
    cv, nv = m.cell_vertices, m.cell_num_vertices
    nat = native.extract_edges(m.num_vertices, cv, nv)
    e_from, e_to, e_cell, e_slot = [], [], [], []
    for k in range(4):
        idx = np.nonzero(k < nv)[0]
        a = cv[idx, k]
        b = np.where((k + 1) < nv[idx], cv[idx, (k + 1) % 4], cv[idx, 0])
        e_from.append(a)
        e_to.append(b)
        e_cell.append(idx)
        e_slot.append(np.full(len(idx), k, np.int32))
    npy = _extract_edges_numpy(
        m.num_vertices,
        np.concatenate(e_from),
        np.concatenate(e_to),
        np.concatenate(e_cell).astype(np.int32),
        np.concatenate(e_slot),
    )
    assert sorted(zip(*[x.tolist() for x in nat])) == sorted(
        zip(*[x.tolist() for x in npy])
    )


def test_rcm_reorder_preserves_physics_and_enables_pallas():
    import jax.numpy as jnp

    from rdycore_tpu.mesh.core import rcm_reorder
    from rdycore_tpu.mesh.exodus import read_exodus
    from rdycore_tpu.operator import build_operator
    from rdycore_tpu.ops.pallas.slotted import to_pallas_backend

    m = read_exodus("/root/reference/share/meshes/Houston1km_with_z.exo")
    mr = rcm_reorder(m)
    ec = mr.edge_cells[mr.edge_cells[:, 1] >= 0]
    assert int(np.abs(ec[:, 0] - ec[:, 1]).max()) < 100  # was 2683
    assert np.isclose(mr.cell_area.sum(), m.cell_area.sum())
    # natural ids travel with cells: sorting by natural id recovers originals
    assert sorted(mr.natural_ids.tolist()) == sorted(m.natural_ids.tolist())
    # the slot-routed Pallas kernel becomes feasible after RCM (the
    # natural ordering's bandwidth 2683 exceeds a 2048-cell window)
    op_nat = build_operator(m, mannings_n=np.zeros(m.num_cells), dtype=jnp.float32)
    # an EXPLICIT max_sup is a hard budget: bandwidth 2683 > 2*1024 fails
    assert to_pallas_backend(op_nat, max_sup=2) is op_nat
    # the default budget auto-escalates to the mesh's bandwidth, so even the
    # natural ordering builds a (fused-only) plan now
    op_nat_p = to_pallas_backend(op_nat, interpret=True)
    assert op_nat_p.edge_flux_backend == "pallas"
    op = build_operator(mr, mannings_n=np.zeros(mr.num_cells), dtype=jnp.float32)
    assert to_pallas_backend(op, max_sup=2).edge_flux_backend == "pallas"

    # physics invariant under reordering: rhs(natural) identical
    import jax.numpy as jnp

    q = np.zeros((3, m.num_cells))
    q[0] = 1.0 + 0.1 * np.sin(m.cell_centroid[:, 0] / 500.0)
    op_a = build_operator(m, mannings_n=np.zeros(m.num_cells))
    op_b = build_operator(mr, mannings_n=np.zeros(mr.num_cells))
    ra = op_a.apply(jnp.asarray(q), 0.1, op_a.zero_boundary_values(), jnp.zeros_like(jnp.asarray(q)))
    perm_nat_a = np.argsort(m.natural_ids)
    perm_nat_b = np.argsort(mr.natural_ids)
    qb = q[:, np.argsort(perm_nat_a)][:, :]  # natural-order q
    # construct q on reordered mesh with matching per-cell values
    inv_b = np.argsort(mr.natural_ids)
    q_b = np.zeros_like(q)
    q_b[:, :] = q[:, np.argsort(m.natural_ids)][:, np.argsort(np.argsort(mr.natural_ids))]
    rb = op_b.apply(jnp.asarray(q_b), 0.1, op_b.zero_boundary_values(), jnp.zeros_like(jnp.asarray(q)))
    ra_nat = np.asarray(ra.rhs)[:, perm_nat_a]
    rb_nat = np.asarray(rb.rhs)[:, perm_nat_b]
    np.testing.assert_allclose(ra_nat, rb_nat, atol=1e-10)
