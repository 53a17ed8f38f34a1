#include <algorithm>
// Native mesh graph builder: the performance-critical setup-time core of the
// DMPlex replacement (reference: src/rdymesh.c RDyEdgesCreateFromDM).
//
// The compute path is JAX/XLA/Pallas; this library owns the host-side mesh
// machinery that the reference implements in C on top of DMPlex:
//   - edge extraction/deduplication from cell->vertex connectivity
//     (hash-based; the NumPy sort-based fallback is O(E log E) and
//     allocation-heavy at the 184M-cell scale of the reference's mesh ladder)
//   - cell->edge transpose map construction
//   - reverse Cuthill-McKee ordering for gather locality on TPU
//   - contiguous-block partition halo enumeration
//
// Exposed via a plain C ABI consumed with ctypes (rdycore_tpu/mesh/native.py).

#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

extern "C" {

// Extract unique edges from tri/quad cells.
//
// cell_vertices: [num_cells * 4], -1 padded; CCW orientation assumed.
// Outputs (caller-allocated, capacity 4 * num_cells):
//   edge_left/right: adjacent cell ids (right = -1 on boundary),
//     left = smaller cell id of the pair (deterministic across partitions)
//   edge_lslot/rslot: local edge slot (0..3) within left/right cell
// Returns the number of unique edges, or -1 on a non-manifold edge.
int64_t rdy_extract_edges(int64_t num_cells, int64_t num_points,
                          const int32_t* cell_vertices,
                          const int32_t* cell_nverts, int32_t* edge_left,
                          int32_t* edge_right, int32_t* edge_lslot,
                          int32_t* edge_rslot) {
  // open-addressing hash table keyed by (vmin, vmax)
  const int64_t max_edges = 4 * num_cells;
  int64_t cap = 1;
  while (cap < 2 * max_edges) cap <<= 1;
  const int64_t mask = cap - 1;
  std::vector<int64_t> keys(cap, -1);
  std::vector<int64_t> slots(cap, -1);  // -> edge index

  int64_t num_edges = 0;
  for (int64_t c = 0; c < num_cells; ++c) {
    const int32_t nv = cell_nverts[c];
    for (int32_t k = 0; k < nv; ++k) {
      const int32_t a = cell_vertices[4 * c + k];
      const int32_t b = cell_vertices[4 * c + ((k + 1) % nv)];
      const int64_t vmin = a < b ? a : b;
      const int64_t vmax = a < b ? b : a;
      const int64_t key = vmin * num_points + vmax;
      // splitmix-style scramble
      uint64_t h = (uint64_t)key;
      h ^= h >> 33;
      h *= 0xff51afd7ed558ccdULL;
      h ^= h >> 33;
      int64_t pos = (int64_t)(h & (uint64_t)mask);
      for (;;) {
        if (keys[pos] == -1) {
          // new edge
          keys[pos] = key;
          slots[pos] = num_edges;
          edge_left[num_edges] = (int32_t)c;
          edge_right[num_edges] = -1;
          edge_lslot[num_edges] = k;
          edge_rslot[num_edges] = -1;
          ++num_edges;
          break;
        }
        if (keys[pos] == key) {
          const int64_t e = slots[pos];
          if (edge_right[e] != -1) return -1;  // non-manifold
          // second cell: keep left = smaller cell id
          if ((int32_t)c < edge_left[e]) {
            edge_right[e] = edge_left[e];
            edge_rslot[e] = edge_lslot[e];
            edge_left[e] = (int32_t)c;
            edge_lslot[e] = k;
          } else {
            edge_right[e] = (int32_t)c;
            edge_rslot[e] = k;
          }
          break;
        }
        pos = (pos + 1) & mask;
      }
    }
  }
  return num_edges;
}

// Reverse Cuthill-McKee ordering of the cell adjacency graph (via edges).
// Improves gather locality: after reordering, edge endpoints are close in
// index space, so windowed Pallas kernels and cache-friendly XLA gathers
// touch contiguous state.
// edge_left/right: [num_edges]; perm_out: [num_cells] (new order: old ids).
void rdy_rcm_order(int64_t num_cells, int64_t num_edges,
                   const int32_t* edge_left, const int32_t* edge_right,
                   int32_t* perm_out) {
  // build adjacency (CSR)
  std::vector<int32_t> degree(num_cells, 0);
  for (int64_t e = 0; e < num_edges; ++e) {
    if (edge_right[e] >= 0) {
      ++degree[edge_left[e]];
      ++degree[edge_right[e]];
    }
  }
  std::vector<int64_t> offset(num_cells + 1, 0);
  for (int64_t c = 0; c < num_cells; ++c) offset[c + 1] = offset[c] + degree[c];
  std::vector<int32_t> adj(offset[num_cells]);
  std::vector<int64_t> fill(offset.begin(), offset.end() - 1);
  for (int64_t e = 0; e < num_edges; ++e) {
    const int32_t l = edge_left[e], r = edge_right[e];
    if (r >= 0) {
      adj[fill[l]++] = r;
      adj[fill[r]++] = l;
    }
  }

  std::vector<char> visited(num_cells, 0);
  int64_t out = 0;
  std::vector<int32_t> order;
  order.reserve(num_cells);
  for (int64_t start = 0; start < num_cells; ++start) {
    if (visited[start]) continue;
    // find a pseudo-peripheral-ish start: lowest degree in this component
    std::queue<int32_t> q;
    q.push((int32_t)start);
    visited[start] = 1;
    order.push_back((int32_t)start);
    while (!q.empty()) {
      const int32_t c = q.front();
      q.pop();
      // push neighbors in increasing-degree order
      std::vector<int32_t> nbrs;
      for (int64_t i = offset[c]; i < offset[c + 1]; ++i) {
        const int32_t n = adj[i];
        if (!visited[n]) {
          visited[n] = 1;
          nbrs.push_back(n);
        }
      }
      std::sort(nbrs.begin(), nbrs.end(), [&](int32_t x, int32_t y) {
        return degree[x] != degree[y] ? degree[x] < degree[y] : x < y;
      });
      for (int32_t n : nbrs) {
        order.push_back(n);
        q.push(n);
      }
    }
  }
  // reverse
  for (int64_t i = 0; i < num_cells; ++i) {
    perm_out[i] = order[num_cells - 1 - i];
  }
  (void)out;
}

// Enumerate halo (ghost) cells for a contiguous block partition.
// For shard p owning [p*B, min((p+1)*B, C)): ghosts = cells adjacent to an
// owned cell but owned elsewhere. Outputs concatenated ghost lists + counts.
// ghost_out capacity must be >= 2 * num_edges.
void rdy_block_halos(int64_t num_cells, int64_t num_edges, int64_t block,
                     int64_t num_shards, const int32_t* edge_left,
                     const int32_t* edge_right, int32_t* ghost_out,
                     int64_t* ghost_counts) {
  std::vector<std::vector<int32_t>> ghosts(num_shards);
  auto owner = [&](int64_t c) {
    int64_t p = c / block;
    return p < num_shards ? p : num_shards - 1;
  };
  for (int64_t e = 0; e < num_edges; ++e) {
    const int32_t l = edge_left[e], r = edge_right[e];
    if (r < 0) continue;
    const int64_t pl = owner(l), pr = owner(r);
    if (pl != pr) {
      ghosts[pl].push_back(r);
      ghosts[pr].push_back(l);
    }
  }
  int64_t out = 0;
  for (int64_t p = 0; p < num_shards; ++p) {
    auto& g = ghosts[p];
    std::sort(g.begin(), g.end());
    g.erase(std::unique(g.begin(), g.end()), g.end());
    ghost_counts[p] = (int64_t)g.size();
    std::memcpy(ghost_out + out, g.data(), g.size() * sizeof(int32_t));
    out += (int64_t)g.size();
  }
}

// One-pass slot packing + coloring for the slot-routed Pallas kernels
// (rdycore_tpu/ops/pallas/slotted.py). Edges arrive sorted by
// min(left, right). Each tile holds <= 1024 edges in an 8x128 L-layout
// (lane = left % 128, row = running count per lane) and a 16x128 R-layout
// (lane = right % 128, row = a color k with (k, laneR) and (k, laneL) both
// unused). A tile closes when the edge count, a lane cap, the color
// search, or the cell-window budget (max_sup supers of 1024 cells, start
// aligned to the tile's first edge) would be violated.
//
// Outputs (caller-allocated): slot_row/color/tile_of [E], ws_rows [<=E]
// (window starts in rows). need_sup[0] gets the max supers actually
// needed. Returns the tile count, or -1 when a single edge alone exceeds
// the window budget (mesh bandwidth too large -- caller falls back).
int64_t rdy_slot_pack_rc(int64_t E, const int64_t* il, const int64_t* ir,
                         int64_t max_sup, int64_t rcap, int64_t* slot_row,
                         int64_t* color, int64_t* tile_of, int64_t* ws_rows,
                         int64_t* need_sup) {
  int64_t ntiles = 0;
  int64_t count = 0, ws_row = 0, hi_row = 0;
  int32_t cntL[128];
  uint32_t usedS[128], usedD[128];
  const uint32_t cmask = (rcap >= 32) ? 0xFFFFFFFFu : ((1u << rcap) - 1u);
  auto open_tile = [&](int64_t lo) {
    std::memset(cntL, 0, sizeof cntL);
    std::memset(usedS, 0, sizeof usedS);
    std::memset(usedD, 0, sizeof usedD);
    count = 0;
    ws_row = ((lo >> 10) << 3);
    ws_rows[ntiles] = ws_row;
    ++ntiles;
  };
  *need_sup = 1;
  for (int64_t e = 0; e < E; ++e) {
    const int64_t l = il[e], r = ir[e];
    const int64_t lo = l < r ? l : r;
    const int64_t hi = l < r ? r : l;
    const int32_t a = (int32_t)(l & 127), b = (int32_t)(r & 127);
    for (int attempt = 0;; ++attempt) {
      bool fresh = (ntiles == 0) || (count == 0 && attempt > 0);
      if (ntiles == 0) open_tile(lo);
      uint32_t freemask =
          ~(usedS[b] | usedD[a]) & cmask;
      bool fits = count < 1024 && cntL[a] < 8 && freemask != 0 &&
                  ((hi >> 7) - ws_row) < max_sup * 8;
      if (fits) {
        slot_row[e] = cntL[a]++;
        const int k = __builtin_ctz(freemask);
        color[e] = k;
        usedS[b] |= 1u << k;
        usedD[a] |= 1u << k;
        tile_of[e] = ntiles - 1;
        const int64_t row_here = hi >> 7;
        if (row_here > hi_row || count == 0) hi_row = row_here;
        const int64_t sup = (hi_row - ws_row) / 8 + 1;
        if (sup > *need_sup) *need_sup = sup;
        ++count;
        break;
      }
      if (fresh) return -1;  // a lone edge exceeds the window budget
      open_tile(lo);
    }
  }
  return ntiles;
}

int64_t rdy_slot_pack(int64_t E, const int64_t* il, const int64_t* ir,
                      int64_t max_sup, int64_t* slot_row, int64_t* color,
                      int64_t* tile_of, int64_t* ws_rows,
                      int64_t* need_sup) {
  return rdy_slot_pack_rc(E, il, ir, max_sup, 16, slot_row, color, tile_of,
                          ws_rows, need_sup);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Cell geometry: areas, centroids, bed slopes, vertex-averaged elevation.
// Bitwise twin of mesh/core.py _polygon_areas_centroids + _cell_slopes +
// the cell_z average (same per-cell accumulation order, f64, no fp
// contraction — the Makefile compiles with -ffp-contract=off so a*b - c*d
// stays two roundings like NumPy).
extern "C" void rdy_cell_geometry(
    int64_t num_cells, const double* pts /* [N,3] */,
    const int32_t* cv /* [C,4] */, const int32_t* nvs /* [C] */,
    double* area_o, double* cx_o, double* cy_o, double* cz_o,
    double* dzdx_o, double* dzdy_o, double* cellz_o) {
  const int MAXV = 4;
  for (int64_t c = 0; c < num_cells; ++c) {
    const int32_t nv = nvs[c];
    int32_t vids[4];
    for (int k = 0; k < MAXV; ++k) {
      const int32_t v = cv[4 * c + k];
      vids[k] = v >= 0 ? v : cv[4 * c + 0];
    }
    auto X = [&](int32_t v) { return pts[3 * v + 0]; };
    auto Y = [&](int32_t v) { return pts[3 * v + 1]; };
    auto Z = [&](int32_t v) { return pts[3 * v + 2]; };

    double area = 0.0, cx = 0.0, cy = 0.0;
    for (int k = 0; k < MAXV; ++k) {
      const int k2 = (k + 1) % MAXV;
      const int32_t a = vids[k];
      int32_t b = (k2 < nv) ? vids[k2] : vids[0];
      if (!(k < nv)) b = a;  // padded slot: degenerate
      const double cross = X(a) * Y(b) - X(b) * Y(a);
      area += cross;
      cx += (X(a) + X(b)) * cross;
      cy += (Y(a) + Y(b)) * cross;
    }
    area *= 0.5;
    cx /= 6.0 * area;
    cy /= 6.0 * area;

    double zw = 0.0, wsum = 0.0;
    for (int k = 0; k < MAXV; ++k) {
      const int k2 = (k + 1) % MAXV;
      const int32_t a = vids[k];
      int32_t b = (k2 < nv) ? vids[k2] : vids[0];
      if (!(k < nv)) b = a;
      const double tri =
          0.5 * std::abs((X(a) - cx) * (Y(b) - cy) -
                         (X(b) - cx) * (Y(a) - cy));
      zw += tri * ((Z(a) + Z(b)) / 3.0);
      wsum += tri;
    }
    double zmean = 0.0;
    for (int k = 0; k < MAXV; ++k)
      zmean += (k < nv) ? Z(vids[k]) : 0.0;
    zmean /= (double)nv;
    const double cz =
        zw / std::max(wsum, 1e-300) + zmean / 3.0;

    area_o[c] = std::abs(area);
    cx_o[c] = cx;
    cy_o[c] = cy;
    cz_o[c] = cz;

    // slopes (rdymesh.c:747-860 via the plane-fit form)
    auto tri_slopes = [&](double x0, double y0, double z0, double x1,
                          double y1, double z1, double x2, double y2,
                          double z2, double* sx, double* sy) {
      const double nx = (y1 - y0) * (z2 - z0) - (z1 - z0) * (y2 - y0);
      const double ny = (z1 - z0) * (x2 - x0) - (x1 - x0) * (z2 - z0);
      const double nz = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0);
      *sx = (nz != 0.0) ? -nx / nz : 0.0;
      *sy = (nz != 0.0) ? -ny / nz : 0.0;
    };
    if (nv == 3) {
      double sx, sy;
      tri_slopes(X(vids[0]), Y(vids[0]), Z(vids[0]), X(vids[1]),
                 Y(vids[1]), Z(vids[1]), X(vids[2]), Y(vids[2]),
                 Z(vids[2]), &sx, &sy);
      dzdx_o[c] = sx;
      dzdy_o[c] = sy;
    } else {
      double ax_ = 0.0, ay_ = 0.0, aa_ = 0.0;
      for (int k = 0; k < 4; ++k) {
        const int32_t a = vids[k];
        const int32_t b = vids[(k + 1) % 4];
        const double ak =
            0.5 * std::abs((X(b) - X(a)) * (cy - Y(a)) -
                           (cx - X(a)) * (Y(b) - Y(a)));
        double sx, sy;
        tri_slopes(X(a), Y(a), Z(a), X(b), Y(b), Z(b), cx, cy, cz, &sx,
                   &sy);
        ax_ += ak * sx;
        ay_ += ak * sy;
        aa_ += ak;
      }
      dzdx_o[c] = ax_ / aa_;
      dzdy_o[c] = ay_ / aa_;
    }

    // vertex-averaged bed elevation (masked mean over real vertices)
    double zsum = 0.0;
    for (int k = 0; k < MAXV; ++k) {
      const int32_t v = cv[4 * c + k];
      zsum += (v >= 0) ? Z(v >= 0 ? v : 0) : 0.0;
    }
    cellz_o[c] = zsum / (double)nv;
  }
}
