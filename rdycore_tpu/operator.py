"""The SWE spatial operator F(q, t) -> dq/dt, TPU-native formulation.

The reference composes CeedOperators / PetscOperators (interior flux,
per-boundary flux, source) that scatter-add edge fluxes into cells
(/root/reference/src/operator.c:348-690). Here the same composite is a single
fused XLA computation in *gather form*:

1. gather left/right cell states onto edges
2. ghost states for boundary edges from their BC
3. one batched Roe solve over ALL edges (interior + boundary)
4. each cell *gathers* its <=4 incident edge fluxes with precomputed
   +-len/area coefficients (deterministic summation order; no scatter)
5. cell-wise source kernel consuming the flux divergence ("riemannf"
   convention, operator.c:224-260)

This keeps the hot path free of scatter-adds (slow + nondeterministic on
accelerators) and is partition-independent by construction.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .constants import (
    DEFAULT_H_ANUGA,
    DEFAULT_TINY_H,
    DEFAULT_XQ2018_THRESHOLD,
    GRAVITY,
)
from .mesh.core import Mesh
from .ops.swe import boundary as bc_mod
from .ops.swe.riemann import regularized_velocity, roe_flux
from .ops.swe.sources import (
    SOURCE_IMPLICIT_XQ2018,
    SOURCE_NONE,
    SOURCE_SEMI_IMPLICIT,
    apply_source_semi_implicit,
    apply_source_xq2018,
)


class BoundarySegment(NamedTuple):
    """Static metadata for one named boundary (a contiguous edge slice)."""

    name: str
    bc_type: int  # bc_mod.BC_* code
    start: int  # offset into the boundary-edge block
    count: int
    edge_ids: np.ndarray  # mesh edge ids (for time series metadata)


class OperatorArrays(NamedTuple):
    """Device-resident geometry/index arrays (a JAX pytree)."""

    # cells [C]
    area: jnp.ndarray
    dz_dx: jnp.ndarray
    dz_dy: jnp.ndarray
    cell_z: jnp.ndarray  # vertex-averaged bed elevation (HR well-balancing)
    mannings_n: jnp.ndarray
    # interior edges [Ei]
    int_left: jnp.ndarray
    int_right: jnp.ndarray
    int_cn: jnp.ndarray
    int_sn: jnp.ndarray
    # boundary edges [Eb] (ordered by segment)
    bnd_left: jnp.ndarray
    bnd_cn: jnp.ndarray
    bnd_sn: jnp.ndarray
    # cell -> edge gather maps [C, MAX_CE]
    cell_edges: jnp.ndarray  # int32 into [0, E]; E = dummy zero-flux edge
    cell_edge_coef: jnp.ndarray  # sign * edge_len / cell_area (0 on padding)
    # per-edge Courant coefficient edge_len / min(adjacent areas) [E]
    edge_courant_coef: jnp.ndarray
    # per-edge length / left-cell area for boundary accounting [Eb]
    bnd_len: jnp.ndarray
    # MUSCL second-order fields (None when first-order)
    cell_ls_cx: jnp.ndarray = None  # [C, K] LS gradient coefficients
    cell_ls_cy: jnp.ndarray = None
    int_dxl: jnp.ndarray = None  # [Ei] centroid -> edge-midpoint displacement
    int_dyl: jnp.ndarray = None
    int_dxr: jnp.ndarray = None
    int_dyr: jnp.ndarray = None
    # BS2002 well-balancing arrays (None unless enabled)
    bs2002: object = None
    # Slot-routed Pallas kernel plan arrays (None unless backend ==
    # "pallas"; interior edges are rebuilt in sorted order at backend-build
    # time; see ops/pallas/slotted.py for the layout)
    pl_ws: jnp.ndarray = None  # [ntiles] i32 q-window starts (8-row units)
    pl_gws: jnp.ndarray = None  # [ntiles//GT] i32 group q-window starts
    pl_supL: jnp.ndarray = None  # [ntiles*8, 128] i32
    pl_supR: jnp.ndarray = None  # [ntiles*16, 128] i32
    pl_m: jnp.ndarray = None  # align R->L lane shuffle (i8)
    pl_g: jnp.ndarray = None  # align R->L row pick (i8)
    pl_gi: jnp.ndarray = None  # route L->R row pick (i8)
    pl_mi: jnp.ndarray = None  # route L->R lane shuffle (i8)
    pl_cn: jnp.ndarray = None  # slotted edge geometry [ntiles*8, 128]
    pl_sn: jnp.ndarray = None
    pl_courant_coef: jnp.ndarray = None
    pl_slot_edge: jnp.ndarray = None  # [ntiles*8*128] i32 slot -> edge
    # divergence kernel plan (per-cell incident-edge slots)
    pl_cd_wsL: jnp.ndarray = None  # [ctiles] i32 fluxL row-window starts
    pl_cd_wsR: jnp.ndarray = None
    # per-k sub-windows for the fused kernels ([(K+1)*ctiles] i32 flat;
    # row 0 = per-tile base, rows 1..K = plane windows, in supers)
    pl_cd_wkL: jnp.ndarray = None
    pl_cd_wkR: jnp.ndarray = None
    pl_cd_gwsL: jnp.ndarray = None  # [ctiles//GT] i32 group window starts
    pl_cd_gwsR: jnp.ndarray = None
    pl_cd_supL: jnp.ndarray = None  # [KL, ctiles*8, 128] i32
    pl_cd_cfL: jnp.ndarray = None  # [KL, ctiles*8, 128] f32
    pl_cd_supR: jnp.ndarray = None
    pl_cd_cfR: jnp.ndarray = None
    # streaming fused edge+cell schedule (ops/pallas/slotted.py
    # FusedSchedule; None -> two-kernel fallback)
    pl_fs_eg: jnp.ndarray = None  # [nsteps] i32 edge-group block index
    pl_fs_cg: jnp.ndarray = None  # [nsteps] i32 cell-group output index
    pl_fs_doc: jnp.ndarray = None  # [nsteps] i32 1 = compute a cell group
    # unified plan (boundary edges folded in-kernel): boundary edge -> flat
    # L-slot position (for routing runtime Dirichlet values); presence
    # signals that the fused kernel's divergence is already complete
    pl_bnd_pos: jnp.ndarray = None  # [Eb] i32
    # full-step schedule (fused STEP kernel: sources + RK stage update in
    # the cell phase, state carried in tile-row layout)
    pl_st_eg: jnp.ndarray = None  # [ns] i32 edge-group block index
    pl_st_cg: jnp.ndarray = None  # [ns] i32 plan-input cell group (clamped)
    pl_st_co: jnp.ndarray = None  # [ns] i32 output block (incl. pad blocks)
    pl_st_doc: jnp.ndarray = None  # [ns] i32 1 = cell phase this step
    # merged single-stream plan layouts for the fused kernel (the separate
    # pl_* planes above still feed the two-kernel / MUSCL paths)
    pl_fz_e8: jnp.ndarray = None  # [ntiles*(16+4*rrows), 128] i8
    pl_fz_ef: jnp.ndarray = None  # [ntiles*(24|40), 128] f32
    pl_fz_c8: jnp.ndarray = None  # [KL+KR, ctiles*8, 128] i8
    pl_fz_cf: jnp.ndarray = None  # [KL+KR, ctiles*8, 128] f32
    # hydrostatic-reconstruction plan arrays (None unless well_balancing_hr)
    pl_hr_dzl: jnp.ndarray = None  # slotted zmax - zL per edge [R8, 128]
    pl_hr_dzr: jnp.ndarray = None
    # HR pressure-correction tables, precomputed at build time so the hot
    # path does no per-apply edge-table concatenates (None unless
    # well_balancing_hr)
    hr_nbr_cell: jnp.ndarray = None  # [C, K] neighbor across each slot edge
    hr_cn: jnp.ndarray = None  # [C, K] edge cos(normal) per slot
    hr_sn: jnp.ndarray = None  # [C, K] edge sin(normal) per slot
    # BS2002 slot-routed plan arrays (ops/swe/bs2002.BS2002PlanArrays)
    pl_bs: object = None
    # MUSCL second-order plan arrays (None unless second_order)
    pl_dxl: jnp.ndarray = None  # slotted centroid->midpoint displacements
    pl_dyl: jnp.ndarray = None
    pl_dxr: jnp.ndarray = None
    pl_dyr: jnp.ndarray = None
    pl_cd_cxL: jnp.ndarray = None  # [KL, ctiles*8, 128] LS gradient coefs
    pl_cd_cyL: jnp.ndarray = None
    pl_cd_cxR: jnp.ndarray = None
    pl_cd_cyR: jnp.ndarray = None


class RHSResult(NamedTuple):
    rhs: jnp.ndarray  # [3, C] dq/dt
    flux_div: jnp.ndarray  # [3, C] flux-divergence part ("riemannf")
    prim: jnp.ndarray  # [3, C] primitive variables (h, u, v)
    boundary_fluxes: jnp.ndarray  # [3, Eb] raw Roe fluxes on boundary edges
    max_courant_per_dt: jnp.ndarray  # scalar: max over edges of amax*len/area
    courant_edge: jnp.ndarray  # int32 scalar: index of that edge (global edge order)


@dataclasses.dataclass(frozen=True, eq=False)
class SWEOperator:
    """Static operator configuration + device arrays.

    Equivalent to the reference's Operator object (rdyoperatorimpl.h:107-206)
    with the CEED/PETSc backend union replaced by XLA (this class) and Pallas
    (ops/pallas) twins sharing the same math.
    """

    arrays: OperatorArrays
    segments: Tuple[BoundarySegment, ...]
    num_cells: int
    num_internal_edges: int
    num_boundary_edges: int
    tiny_h: float = DEFAULT_TINY_H
    h_anuga: float = DEFAULT_H_ANUGA
    source_method: int = SOURCE_SEMI_IMPLICIT
    xq2018_threshold: float = DEFAULT_XQ2018_THRESHOLD
    well_balancing_hr: bool = False  # hydrostatic reconstruction mode
    well_balancing_bs2002: bool = False  # Bradford & Sanders (2002) mode
    second_order: bool = False
    limiter: str = "minmod"  # minmod | vanleer | none
    # Audusse-style per-edge positivity limiting for the second-order XLA
    # path (exact no-op on wet cells; prevents MUSCL front overdraining —
    # beyond the reference, which never runs MUSCL on a drying case and
    # shares the blowup). The pallas MUSCL kernels run unlimited
    # (reference-faithful); disable for exact backend comparisons.
    positivity_limit: bool = True
    # tracers (sediment classes + salinity + heat); when > 0 the flux/source
    # path switches to the coupled flow+tracer kernels, like the reference's
    # tracer operators replacing the SWE ones (src/tracer/)
    num_tracers: int = 0
    num_sediment: int = 0
    riemann: str = "roe"  # roe | upwind_roe (tracer flux choice)
    # interior-edge flux backend: "xla" (gather twin) or "pallas" (fused
    # windowed TPU kernel); the twin-backend pattern mirrors the reference's
    # PETSc/CEED split and is load-bearing for testing
    edge_flux_backend: str = "xla"
    # halo-exchange/compute overlap (sharded, XLA first-order only): the
    # first `frontier_split` interior edges touch only owned cells and are
    # gathered from the UN-exchanged state (q_pure), so XLA can overlap the
    # ppermute with their flux compute; edges >= frontier_split touch ghost
    # cells and read the exchanged state. 0 = disabled.
    frontier_split: int = 0
    # host-side (numpy) copies of the arrays the Pallas plan builder needs;
    # reading device arrays back through the axon relay can take minutes,
    # so to_pallas_backend must never do a device->host round trip
    host_arrays: object = None
    pallas_nsup: int = 0  # q-window supers (slot-routed kernel)
    pallas_wq: int = 0  # group q-window supers (shared DMA window)
    pallas_cd_nsup_l: int = 0  # fluxL window supers (divergence kernel)
    pallas_cd_nsup_r: int = 0
    # per-k-plane window sizes for the fused kernels (static tuples)
    pallas_cd_nsup_lk: tuple = ()
    pallas_cd_nsup_rk: tuple = ()
    pallas_cd_wl: int = 0  # group fluxL window supers
    pallas_cd_wr: int = 0
    # streaming fused kernel meta (nsteps, negrp, nringL, nringR); empty
    # tuple -> use the separate edge + divergence kernels
    pallas_fused_meta: tuple = ()
    # full-step kernel meta (ns, negrp, nringL, nringR, NB, ncgrp); empty
    # tuple -> the interval advancer uses the per-RHS fused kernel + XLA
    # source/integrator glue
    pallas_step_meta: tuple = ()
    pallas_bs_meta: tuple = ()  # BS2002 route/accumulate window supers
    # static BC codes folded into a unified plan (+1-shifted; empty tuple =
    # interior-only plan, boundary fluxes handled by the XLA glue)
    pallas_bnd_kinds: tuple = ()
    # identity-aligned L layout (round 5): edge tile (ct, k) holds cell
    # tile ct's k-th L edges at the owning cell's own (row, lane) — the
    # kernels' L divergence gathers become aligned ring reads
    pallas_ident_l: bool = False
    # remainder boundary edges an aligned plan left OUT of the fold (their
    # flux/Courant/stage corrections run in the XLA glue); None = all
    # boundary edges folded. bnd_sel = the kept subset (indexes
    # boundary_values columns for slot_dirichlet_planes)
    pallas_bnd_rem: object = None  # np.ndarray [R] or None
    pallas_bnd_sel: object = None  # np.ndarray [Eb - R] or None
    # True when dz_dx/dz_dy/mannings_n are each spatially uniform: the
    # fused-step kernel then reads them as scalars instead of streaming
    # three cell planes per step (structure-static; VALUES stay runtime,
    # so set_manning_n with a new uniform value needs no retrace)
    uniform_geom: bool = False
    pallas_interpret: bool = False

    # ---------------------------------------------------------------- helpers
    @property
    def num_edges(self) -> int:
        return self.num_internal_edges + self.num_boundary_edges

    @property
    def ndof(self) -> int:
        return 3 + self.num_tracers

    def zero_boundary_values(self, dtype=jnp.float64) -> jnp.ndarray:
        return jnp.zeros((self.ndof, max(self.num_boundary_edges, 1)), dtype=dtype)

    # ---------------------------------------------------------------- apply
    def apply(
        self,
        q: jnp.ndarray,  # [ndof, C]
        dt,
        boundary_values: jnp.ndarray,  # [ndof, Eb] Dirichlet values per boundary edge
        ext_src: jnp.ndarray,  # [ndof, C] external sources
        q_pure: jnp.ndarray = None,  # pre-halo-exchange state (overlap mode)
    ) -> RHSResult:
        """Evaluate dq/dt. Pure function of its inputs; jit/scan friendly.

        q_pure (sharded overlap mode, frontier_split > 0): the same state
        BEFORE the halo exchange wrote the ghost slots. Owned-cell entries
        are identical in q and q_pure, so every read that only touches owned
        cells (pure-edge gathers, boundary edges, sources) goes through
        q_pure — giving those computations no data dependence on the
        collective, which lets XLA's latency-hiding scheduler run the
        ppermute DMA concurrently with the interior flux work (SURVEY §7
        "halo-exchange overlap"; the reference overlaps nothing,
        operator.c:501-647)."""
        if self.num_tracers > 0:
            return self._apply_tracer(q, dt, boundary_values, ext_src, q_pure)
        a = self.arrays
        dtype = q.dtype
        tiny_h = jnp.asarray(self.tiny_h, dtype)
        h_anuga = jnp.asarray(self.h_anuga, dtype)

        # HR/BS2002 read neighbor/vertex-adjacent cells (ghosts) at the
        # CELL level, so the overlap split only applies to the plain
        # first-order path (the sharded builder only enables it there)
        split = (
            self.frontier_split
            if (
                q_pure is not None
                and not self.well_balancing_hr
                and not self.well_balancing_bs2002
                and not self.second_order
            )
            else 0
        )
        qc = q_pure if split else q
        h, hu, hv = qc[0], qc[1], qc[2]

        use_pallas = (
            self.edge_flux_backend == "pallas"
            and a.pl_supL is not None
            and (not self.well_balancing_hr or a.pl_hr_dzl is not None)
            and (not self.well_balancing_bs2002 or a.pl_bs is not None)
            and (not self.second_order or a.pl_dxl is not None)
        )
        if use_pallas:
            eta_v = None
            bs_args = None
            if self.well_balancing_bs2002:
                from .ops.swe.bs2002 import eta_slotted

                Crows = a.pl_bs.z1r.shape[0]
                h_rows = jnp.pad(
                    h.astype(jnp.float32),
                    (0, Crows * 128 - h.shape[0]),
                ).reshape(Crows, 128)
                eta_v_rows, etab, etae = eta_slotted(
                    a.pl_bs, self.pallas_bs_meta, h_rows, self.tiny_h,
                    interpret=self.pallas_interpret,
                )
                eta_v = eta_v_rows.reshape(-1)
                bs_args = (etab, etae)
            if self.second_order:
                from .ops.pallas.slotted import edge_flux_muscl_slotted

                fluxL, fluxR, amax = edge_flux_muscl_slotted(
                    self, q, interpret=self.pallas_interpret, bs=bs_args
                )
            else:
                if self.pallas_fused_meta and a.pl_fz_e8 is not None:
                    from .ops.pallas.slotted import (
                        FusedSchedule, fused_rhs_slotted,
                        slot_dirichlet_planes,
                    )

                    sched = FusedSchedule(
                        *self.pallas_fused_meta, None, None, None
                    )
                    dir_planes = None
                    if 1 in self.pallas_bnd_kinds:
                        dir_planes = slot_dirichlet_planes(
                            a.pl_bnd_pos, a.pl_supL.shape[0],
                            boundary_values, self.tiny_h, self.h_anuga,
                            sel=self.pallas_bnd_sel,
                        )
                    div, cmax8, cidx8 = fused_rhs_slotted(
                        a, q, self.tiny_h, self.h_anuga, self.pallas_nsup,
                        self.pallas_wq, sched,
                        self.pallas_cd_nsup_lk, self.pallas_cd_nsup_rk,
                        interpret=self.pallas_interpret,
                        hr=self.well_balancing_hr, bs=bs_args,
                        bnd_kinds=self.pallas_bnd_kinds,
                        dir_planes=dir_planes,
                        ident_l=self.pallas_ident_l,
                    )
                    return self._finish_apply(
                        q, dt, boundary_values, ext_src,
                        None, None, None, None,
                        fused=(div, cmax8, cidx8), eta_v=eta_v,
                    )
                from .ops.pallas.slotted import edge_flux_slotted

                fluxL, fluxR, amax = edge_flux_slotted(
                    a, q, self.tiny_h, self.h_anuga, self.pallas_nsup,
                    self.pallas_wq,
                    interpret=self.pallas_interpret,
                    hr=self.well_balancing_hr, bs=bs_args,
                )
            return self._finish_apply(
                q, dt, boundary_values, ext_src,
                None, None, None, None, slotted_flux=(fluxL, fluxR, amax),
                eta_v=eta_v,
            )

        # ---- interior edge states --------------------------------------
        if self.second_order:
            from .ops.swe.muscl import reconstruct_interior_states

            (hl, hul, hvl), (hr, hur, hvr) = reconstruct_interior_states(self, q)
        elif split:
            # pure edges (< split) read the pre-exchange state; frontier
            # edges read the exchanged one. Owned-cell values are identical,
            # so results are bitwise-equal to the unsplit gather.
            hx, hux, hvx = q[0], q[1], q[2]

            def g2(row_pure, row_x, idx):
                return jnp.concatenate(
                    [row_pure[idx[:split]], row_x[idx[split:]]]
                )

            hl = g2(h, hx, a.int_left)
            hul = g2(hu, hux, a.int_left)
            hvl = g2(hv, hvx, a.int_left)
            hr = g2(h, hx, a.int_right)
            hur = g2(hu, hux, a.int_right)
            hvr = g2(hv, hvx, a.int_right)
        else:
            hl = h[a.int_left]
            hul = hu[a.int_left]
            hvl = hv[a.int_left]
            hr = h[a.int_right]
            hur = hu[a.int_right]
            hvr = hv[a.int_right]

        if self.well_balancing_hr:
            # hydrostatic reconstruction (swe_petsc.c:1034-1072): velocities
            # from the *raw* states, depths from eta - max(z)
            ul, vl = regularized_velocity(hl, hul, hvl, tiny_h, h_anuga)
            ur, vr = regularized_velocity(hr, hur, hvr, tiny_h, h_anuga)
            zl = a.cell_z[a.int_left]
            zr = a.cell_z[a.int_right]
            zmax = jnp.maximum(zl, zr)
            hl_raw, hr_raw = hl, hr
            hl = jnp.maximum(0.0, hl + zl - zmax)
            hr = jnp.maximum(0.0, hr + zr - zmax)
        else:
            ul, vl = regularized_velocity(hl, hul, hvl, tiny_h, h_anuga)
            ur, vr = regularized_velocity(hr, hur, hvr, tiny_h, h_anuga)

        fi_h, fi_hu, fi_hv, amax_i = roe_flux(
            hl, ul, vl, hr, ur, vr, a.int_sn, a.int_cn
        )

        if self.well_balancing_bs2002:
            from .ops.swe.bs2002 import dhv_correction, eta_vertices

            eta_v = eta_vertices(a.bs2002, h, tiny_h)
            dfu, dfv = dhv_correction(
                eta_v, a.bs2002.int_vbeg, a.bs2002.int_vend,
                a.bs2002.int_zvbeg, a.bs2002.int_zvend, a.int_cn, a.int_sn,
            )
            fi_hu = fi_hu + dfu
            fi_hv = fi_hv + dfv
        else:
            eta_v = None

        if self.well_balancing_hr:
            # outer guard: both *raw* states dry (swe_petsc.c:1094); inner
            # guard: both *reconstructed* states dry (swe_petsc.c:1112)
            dry_i = (hl_raw < tiny_h) & (hr_raw < tiny_h)
            mask_i = jnp.where(dry_i | ((hl <= tiny_h) & (hr <= tiny_h)), 0.0, 1.0)
        else:
            dry_i = (hl < tiny_h) & (hr < tiny_h)
            mask_i = jnp.where(dry_i, 0.0, 1.0)
        fi_h = fi_h * mask_i
        fi_hu = fi_hu * mask_i
        fi_hv = fi_hv * mask_i
        amax_i = amax_i * mask_i

        # boundary edges + sources only read owned cells: hand them the
        # pre-exchange state in overlap mode (identical values on owned)
        return self._finish_apply(
            qc, dt, boundary_values, ext_src, fi_h, fi_hu, fi_hv, amax_i,
            eta_v=eta_v,
        )

    def _finish_apply(
        self, q, dt, boundary_values, ext_src, fi_h, fi_hu, fi_hv, amax_i,
        eta_v=None, slotted_flux=None, fused=None,
    ) -> RHSResult:
        """Boundary fluxes + cell gather + Courant + sources (shared by the
        XLA and Pallas interior-flux backends)."""
        a = self.arrays
        dtype = q.dtype
        tiny_h = jnp.asarray(self.tiny_h, dtype)
        h_anuga = jnp.asarray(self.h_anuga, dtype)

        fb, amax_b = self.boundary_fluxes(q, boundary_values, eta_v=eta_v)

        # ---- positivity flux limiting (second order only) ---------------
        # MUSCL steepens the drain flux at wetting/drying fronts enough to
        # pull cells negative, after which u = hu/h amplifies explosively
        # (measured on the Thacker bowl; the reference shares the failure
        # mode but never exercises MUSCL on a drying case). Audusse-style
        # per-edge limiting: scale every component of an edge's flux by the
        # donor cell's factor s = min(1, h / (dt * total_drain)), so no
        # cell can be drained below zero in one step. In wet regions
        # s == 1.0 exactly and the fluxes are bitwise unchanged.
        if (
            self.second_order and self.positivity_limit
            and slotted_flux is None and self.num_edges
        ):
            fi_h, fi_hu, fi_hv, fb = self._apply_positivity_limit(
                q[0], dt, (fi_h, fi_hu, fi_hv), fb
            )
        elif (
            self.second_order and self.positivity_limit
            and slotted_flux is not None
        ):
            # slotted twin of the limiter (VERDICT r2 #3: both backends now
            # run limited by default)
            from .ops.pallas.slotted import positivity_scale_slotted

            fL2, fR2, fb = positivity_scale_slotted(
                self, q[0], dt, slotted_flux[0], slotted_flux[1], fb
            )
            slotted_flux = (fL2, fR2, slotted_flux[2])

        # ---- cell gather of edge fluxes --------------------------------
        if fused is not None or slotted_flux is not None:
            if fused is not None:
                # streaming fused kernel already produced the divergence,
                # component-major: reshape below is a free view
                div = fused[0]  # [3, Ct*8, 128]
            else:
                # Pallas divergence kernel over the two slotted flux
                # layouts; boundary contributions land via a small
                # scatter-add (Eb << C updates -- no large XLA gather on
                # the hot path)
                from .ops.pallas.slotted import cell_div_slotted

                div = cell_div_slotted(
                    a, slotted_flux[0], slotted_flux[1],
                    self.pallas_cd_nsup_l, self.pallas_cd_nsup_r,
                    self.pallas_cd_wl, self.pallas_cd_wr,
                    interpret=self.pallas_interpret,
                ).transpose(1, 0, 2)  # [Ct*8, 3, 128] -> component-major
            flux_div = (
                div.reshape(3, -1)[:, : self.num_cells].astype(dtype)
            )
            # unified plans fold the boundary fluxes into the kernel's
            # divergence; only interior-only plans need the scatter-add
            if self.num_boundary_edges and not (
                fused is not None and self.pallas_bnd_kinds
            ):
                coefb = -a.bnd_len / a.area[a.bnd_left]
                flux_div = flux_div.at[:, a.bnd_left].add(fb * coefb)
            elif (
                fused is not None and self.pallas_bnd_kinds
                and self.pallas_bnd_rem is not None
            ):
                # aligned plans leave a small remainder boundary set out
                # of the fold (slot-layout parity, ops/pallas/slotted.py
                # build_slotted_plan_aligned) — scatter just those
                rem = jnp.asarray(self.pallas_bnd_rem, jnp.int32)
                cells_r = a.bnd_left[rem]
                coefb = -a.bnd_len[rem] / a.area[cells_r]
                flux_div = flux_div.at[:, cells_r].add(fb[:, rem] * coefb)
        else:
            flux_all = jnp.concatenate(
                [jnp.stack([fi_h, fi_hu, fi_hv]), fb, jnp.zeros((3, 1), dtype)],
                axis=1,
            )  # [3, E+1] with dummy zero row at E
            gathered = flux_all[:, a.cell_edges]  # [3, C, MAX_CE]
            flux_div = (gathered * a.cell_edge_coef).sum(axis=-1)  # [3, C]

        if self.well_balancing_hr:
            flux_div = flux_div + self._hr_pressure_correction(q, dtype)

        # ---- Courant diagnostics ---------------------------------------
        if fused is not None or slotted_flux is not None:
            Ei = self.num_internal_edges
            if fused is not None:
                # the fused kernel folded amax*coef and the linear slot
                # index down to an (8, 128) block
                cm = fused[1].reshape(-1)
                mi = cm.max()
                ei = a.pl_slot_edge[fused[2].reshape(-1)[jnp.argmax(cm)]]
            else:
                ci = (slotted_flux[2] * a.pl_courant_coef).reshape(-1)
                mi = ci.max()
                ei = a.pl_slot_edge[jnp.argmax(ci)]
            if fused is not None and self.pallas_bnd_kinds:
                # unified plan: folded boundary slots are in the kernel's
                # Courant max/argmax already; merge any remainder edges
                if self.pallas_bnd_rem is not None:
                    rem = jnp.asarray(self.pallas_bnd_rem, jnp.int32)
                    cb = amax_b[rem].astype(jnp.float32) * jnp.asarray(
                        a.edge_courant_coef[Ei:], jnp.float32
                    )[rem]
                    mb = cb.max()
                    max_courant_per_dt = jnp.maximum(mi, mb).astype(dtype)
                    courant_edge = jnp.where(
                        mi >= mb, ei,
                        Ei + rem[jnp.argmax(cb)].astype(jnp.int32),
                    )
                else:
                    max_courant_per_dt = mi.astype(dtype)
                    courant_edge = ei
            elif self.num_boundary_edges:
                cb = amax_b.astype(jnp.float32) * jnp.asarray(
                    a.edge_courant_coef[Ei:], jnp.float32
                )
                mb = cb.max()
                max_courant_per_dt = jnp.maximum(mi, mb).astype(dtype)
                courant_edge = jnp.where(
                    mi >= mb, ei, Ei + jnp.argmax(cb).astype(jnp.int32)
                )
            else:
                max_courant_per_dt = mi.astype(dtype)
                courant_edge = ei
        elif self.num_edges:
            amax_all = jnp.concatenate([amax_i, amax_b])
            courant_per_dt = amax_all * a.edge_courant_coef
            max_courant_per_dt = courant_per_dt.max()
            courant_edge = jnp.argmax(courant_per_dt).astype(jnp.int32)
        else:
            max_courant_per_dt = jnp.zeros((), dtype)
            courant_edge = jnp.zeros((), jnp.int32)

        # ---- sources ----------------------------------------------------
        if self.source_method == SOURCE_IMPLICIT_XQ2018:
            src = apply_source_xq2018(
                q, flux_div, ext_src, a.mannings_n, a.dz_dx, a.dz_dy, dt,
                tiny_h, h_anuga, jnp.asarray(self.xq2018_threshold, dtype),
                include_bed_slope=not self.well_balancing_hr,
            )
        elif self.source_method == SOURCE_NONE:
            from .ops.swe.sources import apply_source_none

            src = apply_source_none(
                q, flux_div, ext_src, a.mannings_n, a.dz_dx, a.dz_dy, dt,
                tiny_h, h_anuga, include_bed_slope=not self.well_balancing_hr,
            )
        else:
            src = apply_source_semi_implicit(
                q, flux_div, ext_src, a.mannings_n, a.dz_dx, a.dz_dy, dt,
                tiny_h, h_anuga, include_bed_slope=not self.well_balancing_hr,
            )

        rhs = flux_div + src.rhs
        return RHSResult(
            rhs=rhs,
            flux_div=flux_div,
            prim=src.prim,
            boundary_fluxes=fb,
            max_courant_per_dt=max_courant_per_dt,
            courant_edge=courant_edge,
        )

    def _apply_tracer(
        self, q, dt, boundary_values, ext_src, q_pure=None
    ) -> RHSResult:
        """Coupled flow + tracer RHS (the reference's tracer operators,
        src/tracer/tracer_fluxes_ceed.h + tracer_sources_ceed.h)."""
        from .ops.tracer.flux import safe_div, tracer_roe_flux
        from .ops.tracer.sources import SedimentParams, tracer_source_terms

        a = self.arrays
        dtype = q.dtype
        tiny_h = jnp.asarray(self.tiny_h, dtype)
        h_anuga = jnp.asarray(self.h_anuga, dtype)
        nt = self.num_tracers
        ndof = 3 + nt
        upwind = self.riemann == "upwind_roe"

        split = (
            self.frontier_split
            if (q_pure is not None and not self.well_balancing_hr)
            else 0
        )
        qc = q_pure if split else q
        h, hu, hv = qc[0], qc[1], qc[2]
        hci = qc[3:]

        use_pallas = (
            self.edge_flux_backend == "pallas"
            and a.pl_supL is not None
            and not self.second_order
            and (not self.well_balancing_hr or a.pl_hr_dzl is not None)
            and not self.well_balancing_bs2002
        )
        slotted_flux = None
        if use_pallas:
            if self.pallas_fused_meta and a.pl_fz_e8 is not None:
                from .ops.pallas.slotted import (
                    FusedSchedule, fused_rhs_slotted,
                    slot_dirichlet_planes,
                )

                sched = FusedSchedule(
                    *self.pallas_fused_meta, None, None, None
                )
                dir_planes = None
                if 1 in self.pallas_bnd_kinds:
                    dir_planes = slot_dirichlet_planes(
                        a.pl_bnd_pos, a.pl_supL.shape[0],
                        boundary_values, self.tiny_h, self.h_anuga,
                        ndof=ndof, sel=self.pallas_bnd_sel,
                    )
                fused = fused_rhs_slotted(
                    a, q, self.tiny_h, self.h_anuga, self.pallas_nsup,
                    self.pallas_wq, sched,
                    self.pallas_cd_nsup_lk, self.pallas_cd_nsup_rk,
                    ndof=ndof, upwind=upwind,
                    interpret=self.pallas_interpret,
                    hr=self.well_balancing_hr,
                    bnd_kinds=self.pallas_bnd_kinds,
                    dir_planes=dir_planes,
                    ident_l=self.pallas_ident_l,
                )
                return self._finish_tracer(
                    q, dt, boundary_values, ext_src, None, None, None,
                    fused=fused,
                )
            from .ops.pallas.slotted import edge_flux_slotted

            slotted_flux = edge_flux_slotted(
                a, q, self.tiny_h, self.h_anuga, self.pallas_nsup,
                self.pallas_wq,
                ndof=ndof, upwind=upwind, interpret=self.pallas_interpret,
                hr=self.well_balancing_hr,
            )
            fi = amax_i = None
            return self._finish_tracer(
                q, dt, boundary_values, ext_src, fi, amax_i, slotted_flux
            )

        # ---- interior edges ------------------------------------------------
        il, ir = a.int_left, a.int_right
        if split:
            hx = q

            def g2(row_pure, row_x, idx):
                return jnp.concatenate(
                    [row_pure[idx[:split]], row_x[idx[split:]]]
                )

            hl = g2(h, hx[0], il)
            hr = g2(h, hx[0], ir)
            hul, hvl = g2(hu, hx[1], il), g2(hv, hx[2], il)
            hur, hvr = g2(hu, hx[1], ir), g2(hv, hx[2], ir)
            ul, vl = regularized_velocity(hl, hul, hvl, tiny_h, h_anuga)
            ur, vr = regularized_velocity(hr, hur, hvr, tiny_h, h_anuga)
            hcil = jnp.concatenate(
                [hci[:, il[:split]], hx[3:, il[split:]]], axis=1
            )
            hcir = jnp.concatenate(
                [hci[:, ir[:split]], hx[3:, ir[split:]]], axis=1
            )
            cil = safe_div(hcil, hl, hl, tiny_h)
            cir = safe_div(hcir, hr, hr, tiny_h)
        else:
            hl, hr = h[il], h[ir]
            ul, vl = regularized_velocity(hl, hu[il], hv[il], tiny_h, h_anuga)
            ur, vr = regularized_velocity(hr, hu[ir], hv[ir], tiny_h, h_anuga)
            cil = safe_div(hci[:, il], hl, hl, tiny_h)
            cir = safe_div(hci[:, ir], hr, hr, tiny_h)

        if self.well_balancing_hr:
            # hydrostatic reconstruction for the coupled system
            # (tracer_fluxes_hydro_recon_ceed.h:70-120): depths from
            # eta - max(z); velocities and concentrations preserved
            zl = a.cell_z[il]
            zr = a.cell_z[ir]
            zmax = jnp.maximum(zl, zr)
            hl_raw, hr_raw = hl, hr
            hl = jnp.maximum(0.0, hl + zl - zmax)
            hr = jnp.maximum(0.0, hr + zr - zmax)
            f_flow, f_tr, amax_i = tracer_roe_flux(
                hl, ul, vl, cil, hr, ur, vr, cir, a.int_sn, a.int_cn, upwind
            )
            outer = (hl_raw > tiny_h) | (hr_raw > tiny_h)
            inner = (hl > tiny_h) | (hr > tiny_h)
            mask_i = (outer & inner).astype(dtype)
        else:
            f_flow, f_tr, amax_i = tracer_roe_flux(
                hl, ul, vl, cil, hr, ur, vr, cir, a.int_sn, a.int_cn, upwind
            )
            mask_i = ((hl > tiny_h) | (hr > tiny_h)).astype(dtype)
        fi = jnp.concatenate([f_flow, f_tr], axis=0) * mask_i
        amax_i = amax_i * mask_i
        return self._finish_tracer(
            qc, dt, boundary_values, ext_src, fi, amax_i, None
        )

    def _finish_tracer(
        self, q, dt, boundary_values, ext_src, fi, amax_i, slotted_flux,
        fused=None,
    ) -> RHSResult:
        from .ops.tracer.flux import safe_div, tracer_roe_flux
        from .ops.tracer.sources import SedimentParams, tracer_source_terms

        a = self.arrays
        dtype = q.dtype
        tiny_h = jnp.asarray(self.tiny_h, dtype)
        h_anuga = jnp.asarray(self.h_anuga, dtype)
        nt = self.num_tracers
        ndof = 3 + nt
        upwind = self.riemann == "upwind_roe"
        h, hu, hv = q[0], q[1], q[2]
        hci = q[3:]

        # ---- boundary edges per segment ------------------------------------
        hb = h[a.bnd_left]
        ub, vb = regularized_velocity(
            hb, hu[a.bnd_left], hv[a.bnd_left], tiny_h, h_anuga
        )
        cib = safe_div(hci[:, a.bnd_left], hb, hb, tiny_h)

        fb_parts: List[jnp.ndarray] = []
        amax_parts: List[jnp.ndarray] = []
        for seg in self.segments:
            sl = slice(seg.start, seg.start + seg.count)
            sn_s, cn_s = a.bnd_sn[sl], a.bnd_cn[sl]
            hl_s, ul_s, vl_s = hb[sl], ub[sl], vb[sl]
            cil_s = cib[:, sl]
            if seg.bc_type == bc_mod.BC_DIRICHLET:
                hr_s = boundary_values[0, sl]
                ur_s, vr_s = regularized_velocity(
                    hr_s, boundary_values[1, sl], boundary_values[2, sl],
                    tiny_h, h_anuga,
                )
                cir_s = safe_div(boundary_values[3:, sl], hr_s, hr_s, tiny_h)
            elif seg.bc_type == bc_mod.BC_REFLECTING:
                hr_s, ur_s, vr_s = bc_mod.reflecting_ghost(
                    hl_s, ul_s, vl_s, sn_s, cn_s
                )
                cir_s = cil_s
            elif seg.bc_type == bc_mod.BC_CRITICAL_OUTFLOW:
                # reference has no tracer critical-outflow kernel; extend it
                # with upstream (left) concentrations on the ghost state
                (hl_s, ul_s, vl_s), (hr_s, ur_s, vr_s) = (
                    bc_mod.critical_outflow_ghost(hl_s, ul_s, vl_s, sn_s, cn_s)
                )
                cir_s = cil_s
            else:
                raise ValueError(f"unsupported tracer BC type {seg.bc_type}")

            f_flow_s, f_tr_s, am_s = tracer_roe_flux(
                hl_s, ul_s, vl_s, cil_s, hr_s, ur_s, vr_s, cir_s,
                sn_s, cn_s, upwind,
            )
            mask = ((hl_s > tiny_h) | (hr_s > tiny_h)).astype(dtype)
            fb_parts.append(jnp.concatenate([f_flow_s, f_tr_s], axis=0) * mask)
            amax_parts.append(am_s * mask)

        if fb_parts:
            fb = jnp.concatenate(fb_parts, axis=1)
            amax_b = jnp.concatenate(amax_parts)
        else:
            fb = jnp.zeros((ndof, 0), dtype)
            amax_b = jnp.zeros((0,), dtype)

        # ---- cell gather ---------------------------------------------------
        if fused is not None or slotted_flux is not None:
            if fused is not None:
                div = fused[0]  # [ndof, Ct*8, 128] component-major
            else:
                from .ops.pallas.slotted import cell_div_slotted

                div = cell_div_slotted(
                    a, slotted_flux[0], slotted_flux[1],
                    self.pallas_cd_nsup_l, self.pallas_cd_nsup_r,
                    self.pallas_cd_wl, self.pallas_cd_wr, ncomp=ndof,
                    interpret=self.pallas_interpret,
                ).transpose(1, 0, 2)
            flux_div = (
                div.reshape(ndof, -1)[:, : self.num_cells].astype(dtype)
            )
            # unified plans fold the boundary fluxes into the kernel's
            # divergence; only interior-only plans need the scatter-add
            if self.num_boundary_edges and not (
                fused is not None and self.pallas_bnd_kinds
            ):
                coefb = -a.bnd_len / a.area[a.bnd_left]
                flux_div = flux_div.at[:, a.bnd_left].add(fb * coefb)
            elif (
                fused is not None and self.pallas_bnd_kinds
                and self.pallas_bnd_rem is not None
            ):
                rem = jnp.asarray(self.pallas_bnd_rem, jnp.int32)
                cells_r = a.bnd_left[rem]
                coefb = -a.bnd_len[rem] / a.area[cells_r]
                flux_div = flux_div.at[:, cells_r].add(fb[:, rem] * coefb)
        else:
            flux_all = jnp.concatenate(
                [fi, fb, jnp.zeros((ndof, 1), dtype)], axis=1
            )
            gathered = flux_all[:, a.cell_edges]
            flux_div = (gathered * a.cell_edge_coef).sum(axis=-1)

        if self.well_balancing_hr:
            # hydrostatic pressure correction on the momentum rows
            # (tracer_fluxes_hydro_recon_ceed.h:128-137); boundary edges see
            # equal bed elevations on both sides, so reconstruction there is
            # the identity and needs no correction
            corr = self._hr_pressure_correction(q[:3], dtype)
            flux_div = flux_div.at[:3].add(corr)

        # ---- Courant diagnostics -------------------------------------------
        if fused is not None or slotted_flux is not None:
            Ei = self.num_internal_edges
            if fused is not None:
                cm = fused[1].reshape(-1)
                mi = cm.max()
                ei = a.pl_slot_edge[fused[2].reshape(-1)[jnp.argmax(cm)]]
            else:
                ci = (slotted_flux[2] * a.pl_courant_coef).reshape(-1)
                mi = ci.max()
                ei = a.pl_slot_edge[jnp.argmax(ci)]
            if fused is not None and self.pallas_bnd_kinds:
                # unified plan: folded boundary slots are in the kernel's
                # Courant max/argmax already; merge any remainder edges
                if self.pallas_bnd_rem is not None:
                    rem = jnp.asarray(self.pallas_bnd_rem, jnp.int32)
                    cb = amax_b[rem].astype(jnp.float32) * jnp.asarray(
                        a.edge_courant_coef[Ei:], jnp.float32
                    )[rem]
                    mb = cb.max()
                    max_courant_per_dt = jnp.maximum(mi, mb).astype(dtype)
                    courant_edge = jnp.where(
                        mi >= mb, ei,
                        Ei + rem[jnp.argmax(cb)].astype(jnp.int32),
                    )
                else:
                    max_courant_per_dt = mi.astype(dtype)
                    courant_edge = ei
            elif self.num_boundary_edges:
                cb = amax_b.astype(jnp.float32) * jnp.asarray(
                    a.edge_courant_coef[Ei:], jnp.float32
                )
                mb = cb.max()
                max_courant_per_dt = jnp.maximum(mi, mb).astype(dtype)
                courant_edge = jnp.where(
                    mi >= mb, ei, Ei + jnp.argmax(cb).astype(jnp.int32)
                )
            else:
                max_courant_per_dt = mi.astype(dtype)
                courant_edge = ei
        else:
            amax_all = jnp.concatenate([amax_i, amax_b])
            courant_per_dt = amax_all * a.edge_courant_coef
            max_courant_per_dt = courant_per_dt.max()
            courant_edge = jnp.argmax(courant_per_dt).astype(jnp.int32)

        # ---- sources -------------------------------------------------------
        rhs_src, prim = tracer_source_terms(
            q, flux_div, ext_src, a.mannings_n, a.dz_dx, a.dz_dy, dt,
            tiny_h, h_anuga, self.num_sediment, SedimentParams(),
            include_bed_slope=not self.well_balancing_hr,
            include_friction=self.source_method != SOURCE_NONE,
        )

        rhs = flux_div + rhs_src
        return RHSResult(
            rhs=rhs,
            flux_div=flux_div,
            prim=prim,
            boundary_fluxes=fb,
            max_courant_per_dt=max_courant_per_dt,
            courant_edge=courant_edge,
        )

    def boundary_fluxes_nd(self, q, boundary_values):
        """boundary_fluxes generalized to the coupled flow+tracer system:
        returns (fb [ndof, Eb], amax_b [Eb]) with the tracer rows advected
        by the same per-segment ghost conventions as _finish_tracer
        (Dirichlet prescribes hc, reflecting/critical keep the upstream
        concentration). Used by the aligned-layout remainder path, which
        adds a small set of unfolded boundary edges in the XLA glue."""
        if self.num_tracers == 0:
            return self.boundary_fluxes(q, boundary_values)
        from .ops.tracer.flux import safe_div, tracer_roe_flux

        a = self.arrays
        dtype = q.dtype
        tiny_h = jnp.asarray(self.tiny_h, dtype)
        h_anuga = jnp.asarray(self.h_anuga, dtype)
        ndof = 3 + self.num_tracers
        upwind = self.riemann == "upwind_roe"
        hb = q[0, a.bnd_left]
        ub, vb = regularized_velocity(
            hb, q[1, a.bnd_left], q[2, a.bnd_left], tiny_h, h_anuga
        )
        cib = safe_div(q[3:, a.bnd_left], hb, hb, tiny_h)
        fb_parts = []
        amax_parts = []
        for seg in self.segments:
            sl = slice(seg.start, seg.start + seg.count)
            sn_s, cn_s = a.bnd_sn[sl], a.bnd_cn[sl]
            hl_s, ul_s, vl_s = hb[sl], ub[sl], vb[sl]
            cil_s = cib[:, sl]
            if seg.bc_type == bc_mod.BC_DIRICHLET:
                hr_s = boundary_values[0, sl]
                ur_s, vr_s = regularized_velocity(
                    hr_s, boundary_values[1, sl], boundary_values[2, sl],
                    tiny_h, h_anuga,
                )
                cir_s = safe_div(
                    boundary_values[3:, sl], hr_s, hr_s, tiny_h
                )
            elif seg.bc_type == bc_mod.BC_REFLECTING:
                hr_s, ur_s, vr_s = bc_mod.reflecting_ghost(
                    hl_s, ul_s, vl_s, sn_s, cn_s
                )
                cir_s = cil_s
            else:  # critical outflow
                (hl_s, ul_s, vl_s), (hr_s, ur_s, vr_s) = (
                    bc_mod.critical_outflow_ghost(
                        hl_s, ul_s, vl_s, sn_s, cn_s
                    )
                )
                cir_s = cil_s
            f_flow_s, f_tr_s, am_s = tracer_roe_flux(
                hl_s, ul_s, vl_s, cil_s, hr_s, ur_s, vr_s, cir_s,
                sn_s, cn_s, upwind,
            )
            mask = ((hl_s > tiny_h) | (hr_s > tiny_h)).astype(dtype)
            fb_parts.append(
                jnp.concatenate([f_flow_s, f_tr_s], axis=0) * mask
            )
            amax_parts.append(am_s * mask)
        if fb_parts:
            return (
                jnp.concatenate(fb_parts, axis=1),
                jnp.concatenate(amax_parts),
            )
        return jnp.zeros((ndof, 0), dtype), jnp.zeros((0,), dtype)

    def boundary_fluxes(self, q, boundary_values, eta_v=None):
        """Roe fluxes + masked max wave speeds on the boundary edges
        (the reference's per-boundary flux sub-operators,
        src/operator_fluxes_ceed.c:289+). Returns (fb [3, Eb], amax_b [Eb]).
        Also used standalone by the fused-step interval path, where the
        kernel owns the divergence but the time-series accounting still
        needs the raw per-edge boundary fluxes."""
        a = self.arrays
        dtype = q.dtype
        tiny_h = jnp.asarray(self.tiny_h, dtype)
        h_anuga = jnp.asarray(self.h_anuga, dtype)
        h, hu, hv = q[0], q[1], q[2]

        hb = h[a.bnd_left]
        hub = hu[a.bnd_left]
        hvb = hv[a.bnd_left]
        ub, vb = regularized_velocity(hb, hub, hvb, tiny_h, h_anuga)

        fb_parts: List[jnp.ndarray] = []
        amax_parts: List[jnp.ndarray] = []
        for seg in self.segments:
            sl = slice(seg.start, seg.start + seg.count)
            sn_s, cn_s = a.bnd_sn[sl], a.bnd_cn[sl]
            (hl_s, ul_s, vl_s), (hr_s, ur_s, vr_s) = bc_mod.ghost_states(
                seg.bc_type,
                hb[sl],
                ub[sl],
                vb[sl],
                sn_s,
                cn_s,
                boundary_values[:, sl],
                tiny_h,
                h_anuga,
            )
            f_h, f_hu, f_hv, am = roe_flux(
                hl_s, ul_s, vl_s, hr_s, ur_s, vr_s, sn_s, cn_s
            )
            if self.well_balancing_bs2002:
                from .ops.swe.bs2002 import dhv_correction

                dfu, dfv = dhv_correction(
                    eta_v,
                    a.bs2002.bnd_vbeg[sl], a.bs2002.bnd_vend[sl],
                    a.bs2002.bnd_zvbeg[sl], a.bs2002.bnd_zvend[sl],
                    cn_s, sn_s,
                )
                f_hu = f_hu + dfu
                f_hv = f_hv + dfv
            dry = (hl_s < tiny_h) & (hr_s < tiny_h)
            mask = jnp.where(dry, 0.0, 1.0)
            fb_parts.append(jnp.stack([f_h, f_hu, f_hv]) * mask)
            amax_parts.append(am * mask)

        if fb_parts:
            fb = jnp.concatenate(fb_parts, axis=1)  # [3, Eb]
            amax_b = jnp.concatenate(amax_parts)
        else:
            fb = jnp.zeros((3, 0), dtype)
            amax_b = jnp.zeros((0,), dtype)
        return fb, amax_b

    def _apply_positivity_limit(self, h, dt, fi, fb):
        """Scale edge fluxes by the donor cell's positivity factor
        s = min(1, h / (dt * drain)). Both cells of an edge see the same
        scaled flux, so conservation is exact; wet cells have s == 1.0
        exactly, leaving their fluxes bitwise unchanged."""
        a = self.arrays
        dtype = h.dtype
        fi_h, fi_hu, fi_hv = fi
        Ei = self.num_internal_edges

        f_h_all = jnp.concatenate(
            [fi_h, fb[0] if fb.shape[1] else jnp.zeros((0,), dtype),
             jnp.zeros((1,), dtype)]
        )
        contrib = f_h_all[a.cell_edges] * a.cell_edge_coef  # [C, K] dh/dt
        drain = -jnp.minimum(contrib, 0.0).sum(axis=-1)  # >= 0
        drain_safe = jnp.where(drain > 0.0, drain, 1.0)
        s = jnp.where(
            drain > 0.0,
            jnp.clip(h / (dt * drain_safe), 0.0, 1.0),
            1.0,
        )

        s_int = jnp.where(fi_h > 0.0, s[a.int_left], s[a.int_right])
        fi_h = fi_h * s_int
        fi_hu = fi_hu * s_int
        fi_hv = fi_hv * s_int
        if fb.shape[1]:
            # boundary: the interior cell is the donor when flow exits
            s_b = jnp.where(fb[0] > 0.0, s[a.bnd_left], 1.0)
            fb = fb * s_b
        return fi_h, fi_hu, fi_hv, fb

    def _hr_pressure_correction(self, q, dtype):
        """Hydrostatic pressure correction term of the HR scheme
        (swe_petsc.c:1136-1153): per edge-side 0.5*g*(h^2 - h_rec^2)*(cn,sn),
        accumulated with the same +-len/area coefficients. Gather form: for
        each cell and incident edge, the correction uses the cell's own h and
        its reconstructed depth at that edge.
        """
        a = self.arrays
        g = jnp.asarray(GRAVITY, dtype)
        tiny_h = jnp.asarray(self.tiny_h, dtype)
        h = q[0]

        # hr_nbr_cell/hr_cn/hr_sn are precomputed per (cell, slot) at build
        # time (build_operator); the hot path is two gathers + elementwise.
        sign = a.cell_edge_coef  # sign * len/area (0 on padding slots)
        nbr = a.hr_nbr_cell  # neighbor across each slot edge; bnd/dummy=self

        z_self = a.cell_z[:, None]
        z_nbr = a.cell_z[nbr]
        h_self = h[:, None]
        h_nbr = h[nbr]

        zmax = jnp.maximum(z_self, z_nbr)
        h_rec = jnp.maximum(0.0, h_self + z_self - zmax)
        corr = 0.5 * g * (h_self * h_self - h_rec * h_rec)

        # outer dry guard (both raw states dry -> no correction), matching
        # swe_petsc.c:1094
        both_dry = (h_self < tiny_h) & (h_nbr < tiny_h)
        corr = jnp.where(both_dry, 0.0, corr)

        dcx = (corr * a.hr_cn * sign).sum(axis=-1)
        dcy = (corr * a.hr_sn * sign).sum(axis=-1)
        zero = jnp.zeros_like(dcx)
        return jnp.stack([zero, dcx, dcy])


# --------------------------------------------------------------------------
# construction
# --------------------------------------------------------------------------

def build_operator(
    mesh: Mesh,
    bc_types: Optional[Dict[str, int]] = None,
    mannings_n: Optional[np.ndarray] = None,
    tiny_h: float = DEFAULT_TINY_H,
    h_anuga: float = DEFAULT_H_ANUGA,
    source_method: int = SOURCE_SEMI_IMPLICIT,
    xq2018_threshold: float = DEFAULT_XQ2018_THRESHOLD,
    well_balancing_hr: bool = False,
    well_balancing_bs2002: bool = False,
    second_order: bool = False,
    limiter: str = "minmod",
    positivity_limit: bool = True,
    num_tracers: int = 0,
    num_sediment: int = 0,
    riemann: str = "roe",
    dtype=jnp.float64,
) -> SWEOperator:
    """Build an SWEOperator from a Mesh.

    bc_types maps boundary name -> BC_* code; unlisted boundaries get the
    reflecting wall BC, like the reference's auto-assignment
    (rdysetup.c:706-777).
    """
    if second_order and num_tracers:
        # the reference errors likewise (operator.c:361-363); our tracer
        # path has no reconstruction and would silently run first order
        raise ValueError(
            "second-order MUSCL reconstruction is only supported for pure "
            "SWE (no sediment, salinity, or heat tracers)"
        )
    if second_order and well_balancing_hr:
        # the reference errors likewise ('not yet implemented',
        # operator.c:388-390); measured here: the h-based MUSCL
        # reconstruction breaks HR's lake-at-rest exactness (|rhs| ~ 0.8
        # on still water over a bumpy bed)
        raise ValueError(
            "second_order cannot be used with well_balancing = "
            "hydrostatic_reconstruction"
        )
    bc_types = dict(bc_types or {})
    unknown = set(bc_types) - set(mesh.boundaries)
    if unknown:
        # fail cleanly like the reference's nonexistent-boundary negative test
        # (driver/tests/bad_input/nonexistent_boundary.yaml)
        raise ValueError(
            f"boundary condition(s) reference unknown boundaries: {sorted(unknown)}; "
            f"mesh defines {sorted(n for n in mesh.boundaries if not n.startswith('__id_'))}"
        )
    Ei = mesh.num_internal_edges
    E = mesh.num_edges
    C = mesh.num_cells

    # boundary segments: order boundary edges by (segment, edge id);
    # id-only sets with no named counterpart surface as boundary_<id>
    from .mesh.core import named_boundary_sets

    segments: List[BoundarySegment] = []
    order: List[np.ndarray] = []
    start = 0
    for name, eids in named_boundary_sets(mesh).items():
        bc = bc_types.get(name, bc_mod.BC_REFLECTING)
        segments.append(
            BoundarySegment(
                name=name, bc_type=bc, start=start, count=len(eids), edge_ids=eids
            )
        )
        order.append(np.asarray(eids, dtype=np.int64))
        start += len(eids)
    bnd_order = (
        np.concatenate(order) if order else np.zeros(0, dtype=np.int64)
    )
    assert start == E - Ei, (
        f"boundary segments cover {start} edges but mesh has {E - Ei}"
    )

    # remap edge index: new order = [internal (unchanged) | bnd_order]
    edge_perm = np.concatenate([np.arange(Ei, dtype=np.int64), bnd_order])
    inv_perm = np.empty(E + 1, dtype=np.int64)
    inv_perm[edge_perm] = np.arange(E)
    inv_perm[E] = E  # dummy stays dummy

    cell_edges = inv_perm[mesh.cell_edges].astype(np.int32)

    area = mesh.cell_area
    lengths = mesh.edge_length[edge_perm]
    left = mesh.edge_cells[edge_perm, 0]
    right = mesh.edge_cells[edge_perm, 1]

    # cell-edge coefficient: sign * len / area (precomputed so the gather is
    # a single fused multiply-add)
    elen_pad = np.concatenate([lengths, [0.0]])
    coef = (
        mesh.cell_edge_sign
        * elen_pad[cell_edges]
        / area[:, None]
    )

    # Courant coefficient len / min(adjacent areas)
    area_l = area[left]
    area_r = np.where(right >= 0, area[np.where(right >= 0, right, 0)], np.inf)
    ccoef = lengths / np.minimum(area_l, area_r)

    if mannings_n is None:
        mannings_n = np.zeros(C)
    uniform_geom = bool(
        np.ptp(mesh.cell_dz_dx) == 0
        and np.ptp(mesh.cell_dz_dy) == 0
        and np.ptp(np.asarray(mannings_n)) == 0
    )

    f = lambda x: jnp.asarray(x, dtype=dtype)
    i = lambda x: jnp.asarray(x, dtype=jnp.int32)

    bs_fields = {}
    bs_host = {}
    if well_balancing_bs2002:
        from .ops.swe.bs2002 import build_bs2002_arrays

        bs_arr, bs_host = build_bs2002_arrays(
            mesh, edge_perm, Ei, dtype, return_host=True
        )
        bs_fields = dict(bs2002=bs_arr)

    hr_fields = {}
    if well_balancing_hr:
        # HR pressure-correction tables (VERDICT r1 #10): per (cell, slot)
        # neighbor cell + edge normal, so _hr_pressure_correction needs no
        # per-apply edge-table construction. Boundary edges see equal bed on
        # both sides (reconstruction = identity), so neighbor = self there;
        # dummy slots have coef == 0 and any neighbor (self) is safe.
        nbr_l = np.concatenate([left[:Ei], left[Ei:], [0]])
        nbr_r = np.concatenate(
            [np.where(right[:Ei] >= 0, right[:Ei], 0), left[Ei:], [0]]
        )
        # "this cell is the left cell" <=> negative gather coefficient
        is_left_slot = coef < 0
        nbr = np.where(is_left_slot, nbr_r[cell_edges], nbr_l[cell_edges])
        nbr = np.where(
            cell_edges == E, np.arange(C, dtype=np.int64)[:, None], nbr
        )
        cn_pad = np.concatenate([mesh.edge_cn[edge_perm], [0.0]])
        sn_pad = np.concatenate([mesh.edge_sn[edge_perm], [0.0]])
        hr_fields = dict(
            hr_nbr_cell=i(nbr),
            hr_cn=f(cn_pad[cell_edges]),
            hr_sn=f(sn_pad[cell_edges]),
        )

    muscl_fields = {}
    if second_order:
        from .ops.swe.muscl import precompute_ls_coefficients

        cx, cy, dxl, dyl, dxr, dyr = precompute_ls_coefficients(
            mesh, edge_perm, Ei
        )
        muscl_fields = dict(
            cell_ls_cx=f(cx),
            cell_ls_cy=f(cy),
            int_dxl=f(dxl),
            int_dyl=f(dyl),
            int_dxr=f(dxr),
            int_dyr=f(dyr),
        )
        muscl_host = dict(
            cell_ls_cx=np.asarray(cx), cell_ls_cy=np.asarray(cy),
            int_dxl=np.asarray(dxl), int_dyl=np.asarray(dyl),
            int_dxr=np.asarray(dxr), int_dyr=np.asarray(dyr),
        )
    else:
        muscl_host = {}

    arrays = OperatorArrays(
        area=f(area),
        dz_dx=f(mesh.cell_dz_dx),
        dz_dy=f(mesh.cell_dz_dy),
        cell_z=f(mesh.cell_z),
        mannings_n=f(mannings_n),
        int_left=i(left[:Ei]),
        int_right=i(right[:Ei]),
        int_cn=f(mesh.edge_cn[edge_perm][:Ei]),
        int_sn=f(mesh.edge_sn[edge_perm][:Ei]),
        bnd_left=i(left[Ei:]),
        bnd_cn=f(mesh.edge_cn[edge_perm][Ei:]),
        bnd_sn=f(mesh.edge_sn[edge_perm][Ei:]),
        cell_edges=i(cell_edges),
        cell_edge_coef=f(coef),
        edge_courant_coef=f(ccoef),
        bnd_len=f(lengths[Ei:]),
        **muscl_fields,
        **bs_fields,
        **hr_fields,
    )

    host_arrays = dict(
        int_left=np.asarray(left[:Ei]),
        int_right=np.asarray(right[:Ei]),
        int_cn=np.asarray(mesh.edge_cn[edge_perm][:Ei]),
        int_sn=np.asarray(mesh.edge_sn[edge_perm][:Ei]),
        bnd_left=np.asarray(left[Ei:]),
        bnd_cn=np.asarray(mesh.edge_cn[edge_perm][Ei:]),
        bnd_sn=np.asarray(mesh.edge_sn[edge_perm][Ei:]),
        cell_edges=np.asarray(cell_edges),
        cell_edge_coef=np.asarray(coef),
        edge_courant_coef=np.asarray(ccoef),
        cell_z=np.asarray(mesh.cell_z),
        **muscl_host,
        **bs_host,
    )

    return SWEOperator(
        arrays=arrays,
        host_arrays=host_arrays,
        segments=tuple(segments),
        num_cells=C,
        num_internal_edges=Ei,
        num_boundary_edges=E - Ei,
        tiny_h=tiny_h,
        h_anuga=h_anuga,
        source_method=source_method,
        xq2018_threshold=xq2018_threshold,
        well_balancing_hr=well_balancing_hr,
        well_balancing_bs2002=well_balancing_bs2002,
        second_order=second_order,
        limiter=limiter,
        positivity_limit=positivity_limit,
        num_tracers=num_tracers,
        num_sediment=num_sediment,
        riemann=riemann,
        uniform_geom=uniform_geom,
    )


def with_arrays(op: SWEOperator, arrays: OperatorArrays) -> SWEOperator:
    """Rebind the device arrays of an operator (used to thread arrays through
    jit as explicit arguments rather than baked-in constants)."""
    return dataclasses.replace(op, arrays=arrays)
