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

// Stable LSD radix argsort of the concatenated interior + boundary edge
// set by min(left, right) — the slotted plan's canonical order (slotted.py
// build_slotted_plan) — emitting the sorted (il, ir) alongside the
// permutation so the caller never materialises the concatenated arrays.
// Boundary pseudo-edges have il == ir == bl. Cell ids fit uint32 at the
// reference's largest mesh (184.5M cells); (key << 32 | idx) packing keeps
// each radix pass a sequential read (numpy's stable argsort on 5.7M i64
// keys costs ~0.6 s at the 2.88M-cell bench mesh, this is ~80 ms).
void rdy_sort_fold(int64_t Ei, int64_t Eb, const int64_t* il_i,
                   const int64_t* ir_i, const int64_t* bl,
                   int64_t* order_out, int64_t* il_sorted,
                   int64_t* ir_sorted) {
  const int64_t E = Ei + Eb;
  std::vector<uint64_t> kv(E), tmp(E);
  uint32_t maxkey = 0;
  for (int64_t e = 0; e < Ei; ++e) {
    const int64_t l = il_i[e], r = ir_i[e];
    const uint32_t k = (uint32_t)(l < r ? l : r);
    if (k > maxkey) maxkey = k;
    kv[e] = ((uint64_t)k << 32) | (uint64_t)e;
  }
  for (int64_t e = 0; e < Eb; ++e) {
    const uint32_t k = (uint32_t)bl[e];
    if (k > maxkey) maxkey = k;
    kv[Ei + e] = ((uint64_t)k << 32) | (uint64_t)(Ei + e);
  }
  int64_t count[256];
  for (int shift = 32; shift < 64 && (maxkey >> (shift - 32)) != 0;
       shift += 8) {
    std::memset(count, 0, sizeof count);
    for (int64_t e = 0; e < E; ++e) ++count[(kv[e] >> shift) & 255];
    int64_t pos = 0;
    for (int b = 0; b < 256; ++b) {
      const int64_t c = count[b];
      count[b] = pos;
      pos += c;
    }
    for (int64_t e = 0; e < E; ++e) tmp[count[(kv[e] >> shift) & 255]++] = kv[e];
    kv.swap(tmp);
  }
  for (int64_t e = 0; e < E; ++e) {
    const int64_t o = (int64_t)(kv[e] & 0xFFFFFFFFu);
    order_out[e] = o;
    if (o < Ei) {
      il_sorted[e] = il_i[o];
      ir_sorted[e] = ir_i[o];
    } else {
      il_sorted[e] = bl[o - Ei];
      ir_sorted[e] = bl[o - Ei];
    }
  }
}

// Fill the slot-routed edge plan planes in one pass (slotted.py
// build_slotted_plan lines after packing: ~3.9 s of separate numpy
// fancy-index scatters at the 2.88M-cell bench mesh collapse to one
// cache-warm sweep). Every edge owns a unique (rowL, laneL) and a unique
// (rowR, laneR) slot by construction of the packer, so the scatters are
// race-free and the loop parallelizes; the sequential opid prefix pass is
// O(E) adds.
//
// Inputs: `order`/`il`/`ir` come from rdy_sort_fold (sorted); per-edge
// attributes stay SPLIT as interior [Ei] + boundary [Eb] blocks (indexed
// through `order`), so the caller never materialises concatenated copies.
// Unified mode (boundary folding) is signalled with has_bnd == 0/1; the
// slot BC code is bt[o - Ei] + 1, interior slots 0. ws_tile: per-tile
// window starts in rows. Outputs are caller-zeroed.
void rdy_fill_slot_planes(
    int64_t E, int64_t Ei, int64_t has_bnd, int64_t rrows,
    const int64_t* order, const int64_t* il, const int64_t* ir,
    const double* cn_i, const double* sn_i, const double* cc_i,
    const double* cn_b, const double* sn_b, const double* cc_b,
    const int64_t* bt, const int64_t* slot_row, const int64_t* color,
    const int64_t* tile_of, const int64_t* ws_tile,
    int8_t* supL, int8_t* supR, int8_t* m_al, int8_t* g_al, int8_t* gi,
    int8_t* mi, float* cn_s, float* sn_s, float* cc_s, int32_t* slot_edge,
    int64_t* eposL, int64_t* eposR, int32_t* bnd_pos) {
  // interior rank prefix (opid for unified plans)
  std::vector<int32_t> opid;
  if (has_bnd) {
    opid.resize(E);
    int32_t rank = 0;
    for (int64_t e = 0; e < E; ++e) {
      const int64_t o = order[e];
      opid[e] = o < Ei ? rank++ : (int32_t)(Ei + (o - Ei));
    }
  }
#pragma omp parallel for schedule(static)
  for (int64_t e = 0; e < E; ++e) {
    const int64_t o = order[e];
    const int64_t l = il[e], r = ir[e];
    const int64_t t = tile_of[e];
    const int64_t ws = ws_tile[t];
    const int64_t laneL = l & 127, laneR = r & 127;
    const int64_t rowL = t * 8 + slot_row[e];
    const int64_t rowR = t * rrows + color[e];
    const int64_t pL = rowL * 128 + laneL;
    const int64_t pR = rowR * 128 + laneR;
    supL[pL] = (int8_t)(l / 128 - ws);
    supR[pR] = (int8_t)(r / 128 - ws);
    m_al[rowR * 128 + laneL] = (int8_t)laneR;
    if (has_bnd) {
      const int64_t code = o < Ei ? 0 : bt[o - Ei] + 1;
      g_al[pL] = (int8_t)(color[e] | (code << 4));
      slot_edge[pL] = opid[e];
      if (o >= Ei) bnd_pos[o - Ei] = (int32_t)pL;
    } else {
      g_al[pL] = (int8_t)color[e];
      slot_edge[pL] = (int32_t)e;
    }
    gi[rowR * 128 + laneL] = (int8_t)slot_row[e];
    mi[pR] = (int8_t)laneL;
    const bool bi = o < Ei;
    cn_s[pL] = (float)(bi ? cn_i[o] : cn_b[o - Ei]);
    sn_s[pL] = (float)(bi ? sn_i[o] : sn_b[o - Ei]);
    cc_s[pL] = (float)(bi ? cc_i[o] : cc_b[o - Ei]);
    eposL[e] = pL;
    eposR[e] = pR;
  }
}

// Side filter for the unified cell plan (slotted.py build_cell_plan): an
// edge contributes to a side iff it is interior (btype == 0) or its signed
// coefficient on that side is armed. Emits the filtered (cell, row, coef)
// triple in one pass (rows = epos / 128), replacing four 5.7M-element
// numpy temporaries per side. has_bt == 0 keeps every edge (non-unified
// plans) and only computes rows. Returns the filtered count.
int64_t rdy_cell_side_filter(int64_t E, int64_t has_bt,
                             const int64_t* cells_sorted,
                             const int64_t* epos, const double* coef,
                             const int64_t* btype_sorted,
                             int64_t* out_cells, int64_t* out_rows,
                             double* out_coef) {
  int64_t n = 0;
  for (int64_t e = 0; e < E; ++e) {
    if (has_bt && btype_sorted[e] != 0 && coef[e] == 0.0) continue;
    out_cells[n] = cells_sorted[e];
    out_rows[n] = epos[e] / 128;
    out_coef[n] = coef[e];
    ++n;
  }
  return n;
}

// Per-edge signed len/area coefficients wrt the left and right cells,
// extracted from the operator's [C, K] cell->edge gather maps (slotted.py
// build_plan_arrays: ~0.6 s of reshapes/masks/scatters at the bench mesh).
// Boundary pseudo-edges (e >= Ei) key off bl. Outputs caller-zeroed [E_lim].
void rdy_coef_extract(int64_t C, int64_t K, int64_t E_lim, int64_t Ei,
                      const int64_t* ce, const double* cec,
                      const int64_t* il_i, const int64_t* bl,
                      double* coefL, double* coefR) {
#pragma omp parallel for schedule(static)
  for (int64_t c = 0; c < C; ++c) {
    for (int64_t j = c * K; j < (c + 1) * K; ++j) {
      const int64_t e = ce[j];
      if (e < 0 || e >= E_lim) continue;
      const int64_t left = e < Ei ? il_i[e] : bl[e - Ei];
      if (left == c)
        coefL[e] = cec[j];
      else
        coefR[e] = cec[j];
    }
  }
}

// Remap the operator's cell->edge map to the plan's sorted interior-edge
// order: inv[] is the original -> sorted interior permutation derived from
// `order` (boundary/dummy indices >= Ei pass through). Replaces a
// three-temporary np.where at C*K elements.
void rdy_remap_ce(int64_t E, int64_t Ei, const int64_t* order, int64_t n,
                  const int64_t* ce, int64_t* ce_new) {
  std::vector<int64_t> inv(Ei);
  int64_t rank = 0;
  for (int64_t e = 0; e < E; ++e) {
    const int64_t o = order[e];
    if (o < Ei) inv[o] = rank++;
  }
#pragma omp parallel for schedule(static)
  for (int64_t j = 0; j < n; ++j) {
    const int64_t e = ce[j];
    // mirrors np.where(ce < Ei, inv[np.clip(ce, 0, Ei - 1)], ce)
    ce_new[j] = (e < Ei) ? inv[e < 0 ? 0 : e] : e;
  }
}

// Cell-plan side statistics (slotted.py build_cell_plan + _rank_by_row):
// per-entry k plane = rank of `rows` within each cell ordered by row, plus
// per-tile row extents. Counting-bucket by cell then an insertion sort of
// each cell's <= K entries replaces numpy's O(n log n) lexsort (~0.8 s per
// side at the bench mesh). Returns K (max entries per cell); tlo/thi are
// INT64_MAX / 0 for untouched tiles, matching the numpy initialisation.
int64_t rdy_cell_side_stats(int64_t n, const int64_t* cells,
                            const int64_t* rows, int64_t num_cells,
                            int64_t Ct, int64_t* k_out, int64_t* tlo,
                            int64_t* thi) {
  std::vector<int64_t> start(num_cells + 1, 0);
  for (int64_t i = 0; i < n; ++i) ++start[cells[i] + 1];
  int64_t K = 0;
  for (int64_t c = 0; c < num_cells; ++c) {
    if (start[c + 1] > K) K = start[c + 1];
    start[c + 1] += start[c];
  }
  std::vector<int64_t> fill(start.begin(), start.end() - 1);
  std::vector<int64_t> bucket(n);
  for (int64_t i = 0; i < n; ++i) bucket[fill[cells[i]]++] = i;
  for (int64_t t = 0; t < Ct; ++t) {
    tlo[t] = INT64_MAX;
    thi[t] = 0;
  }
#pragma omp parallel for schedule(static)
  for (int64_t c = 0; c < num_cells; ++c) {
    const int64_t s = start[c], e = start[c + 1];
    // insertion sort of [s, e) by row (stable; segments are tiny)
    for (int64_t i = s + 1; i < e; ++i) {
      const int64_t b = bucket[i];
      const int64_t rb = rows[b];
      int64_t j = i - 1;
      while (j >= s && rows[bucket[j]] > rb) {
        bucket[j + 1] = bucket[j];
        --j;
      }
      bucket[j + 1] = b;
    }
    for (int64_t i = s; i < e; ++i) k_out[bucket[i]] = i - s;
  }
  for (int64_t i = 0; i < n; ++i) {
    const int64_t t = cells[i] / 1024;
    const int64_t r = rows[i];
    if (r < tlo[t]) tlo[t] = r;
    if (r > thi[t]) thi[t] = r;
  }
  return K;
}

// Cell-plan side fill (slotted.py build_cell_plan): per-(k, tile) windows
// + the three K-plane scatters (per-tile-relative sup, coef, per-k-relative
// sup). ws: per-tile window starts in ROWS; base_sup: per-tile fallback
// window in SUPERS for empty (k, tile) combos. wk_o: [(K+1) * Ct] int32
// (plane 0 = base_sup); nsup_ks_o: [K]. sup/cf/supk are caller-zeroed
// [K * Ct*8 * 128] planes. (k, cell-row, lane) triples are unique per
// entry, so the scatter loop is race-free.
void rdy_cell_side_fill(int64_t n, const int64_t* cells, const int64_t* rows,
                        const int64_t* k, const double* coef,
                        const int64_t* ws, const int64_t* base_sup,
                        int64_t K, int64_t Ct, int8_t* sup_o, float* cf_o,
                        int8_t* supk_o, int32_t* wk_o, int64_t* nsup_ks_o) {
  std::vector<int64_t> lo((size_t)K * Ct, INT64_MAX);
  std::vector<int64_t> hi((size_t)K * Ct, -1);
  for (int64_t i = 0; i < n; ++i) {
    const int64_t t = cells[i] / 1024;
    const size_t p = (size_t)(k[i] * Ct + t);
    const int64_t r = rows[i];
    if (r < lo[p]) lo[p] = r;
    if (r > hi[p]) hi[p] = r;
  }
  for (int64_t t = 0; t < Ct; ++t) wk_o[t] = (int32_t)base_sup[t];
  for (int64_t kk = 0; kk < K; ++kk) {
    int64_t nsup = 0;
    for (int64_t t = 0; t < Ct; ++t) {
      const size_t p = (size_t)(kk * Ct + t);
      int64_t w;
      if (hi[p] >= 0) {
        w = lo[p] / 8;
        const int64_t d = hi[p] / 8 - w;
        if (d > nsup) nsup = d;
      } else {
        w = base_sup[t];
      }
      wk_o[(kk + 1) * Ct + t] = (int32_t)w;
    }
    nsup_ks_o[kk] = nsup + 1;
  }
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const int64_t c = cells[i];
    const int64_t t = c / 1024;
    const int64_t crow = c / 128, clane = c & 127;
    const size_t p = (size_t)(k[i] * Ct * 8 + crow) * 128 + clane;
    sup_o[p] = (int8_t)(rows[i] - ws[t]);
    cf_o[p] = (float)coef[i];
    supk_o[p] =
        (int8_t)(rows[i] - (int64_t)wk_o[(k[i] + 1) * Ct + t] * 8);
  }
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
