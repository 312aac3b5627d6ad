// Native host runtime for multicol_slam_tpu (C++17, built as a shared
// library, bound via ctypes).
//
// The reference implements its entire runtime in C++; in this
// framework the TPU owns the math and the host owns bookkeeping. The
// pieces that are hot on the host side are implemented here:
//
//  - octree_distribute: EXACT re-implementation of the reference's
//    spatially-uniform keypoint selection semantics
//    (mdBRIEFextractorOct.cpp:631-861 DistributeOctTree): recursively
//    split nodes containing >1 keypoint until the node budget is
//    reached, then keep the best-response keypoint per node. Used as
//    the bit-parity alternative to the device-side bucketed top-k.
//  - covisibility_counts: shared-landmark counting between a keyframe
//    and all others from the flat observation table
//    (cMultiKeyFrame::UpdateConnections, cMultiKeyFrame.cpp:406-500).
//  - distinctive_descriptor: min-median Hamming selection among a
//    landmark's observed descriptors (cMapPoint.cpp:294-388).
//  - shared_word_counts: inverted-file accumulation for loop/reloc
//    candidate detection (cMultiKeyFrameDatabase.cpp:82-211).
//
// Build: make -C multicol_slam_tpu/runtime  (see Makefile).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <list>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Octree keypoint distribution
// ---------------------------------------------------------------------------

struct QNode {
  float minx, maxx, miny, maxy;
  std::vector<int> idx;     // candidate indices inside this node
  bool no_more = false;     // single keypoint -> final
};

// Returns number of selected indices written to out_idx (capacity n).
int octree_distribute(const float* xs, const float* ys, const float* resp,
                      int n, int target, float minx, float maxx, float miny,
                      float maxy, int* out_idx) {
  if (n <= 0 || target <= 0) return 0;
  if (n <= target) {
    for (int i = 0; i < n; ++i) out_idx[i] = i;
    return n;
  }
  // initial nodes: split the x range into round(w/h) cells (reference
  // seeds nIni = round(width/height) root nodes)
  const float w = maxx - minx, h = maxy - miny;
  int n_ini = std::max(1, (int)std::min(8.0f, (float)(int)(w / std::max(h, 1.0f) + 0.5f)));
  const float hx = w / n_ini;

  std::list<QNode> nodes;
  for (int i = 0; i < n_ini; ++i) {
    QNode node;
    node.minx = minx + hx * i;
    node.maxx = minx + hx * (i + 1);
    node.miny = miny;
    node.maxy = maxy;
    nodes.push_back(node);
  }
  {
    auto it = nodes.begin();
    std::vector<QNode*> roots(n_ini);
    int k = 0;
    for (; it != nodes.end(); ++it) roots[k++] = &*it;
    for (int i = 0; i < n; ++i) {
      int cell = std::min(n_ini - 1, std::max(0, (int)((xs[i] - minx) / hx)));
      roots[cell]->idx.push_back(i);
    }
  }
  // drop empties; mark singletons
  for (auto it = nodes.begin(); it != nodes.end();) {
    if (it->idx.empty()) {
      it = nodes.erase(it);
    } else {
      it->no_more = (it->idx.size() == 1);
      ++it;
    }
  }

  bool finished = false;
  while (!finished) {
    int prev_size = (int)nodes.size();
    // expandable nodes + their sizes for the "split biggest first" pass
    int to_expand = 0;
    for (auto& nd : nodes)
      if (!nd.no_more) ++to_expand;

    if ((int)nodes.size() >= target || to_expand == 0) break;

    std::vector<std::pair<int, QNode*>> size_and_node;
    std::list<QNode> fresh;
    for (auto it = nodes.begin(); it != nodes.end();) {
      if (it->no_more) {
        ++it;
        continue;
      }
      // split into 4 children
      QNode kids[4];
      const float cx = 0.5f * (it->minx + it->maxx);
      const float cy = 0.5f * (it->miny + it->maxy);
      for (int k = 0; k < 4; ++k) {
        kids[k].minx = (k % 2 == 0) ? it->minx : cx;
        kids[k].maxx = (k % 2 == 0) ? cx : it->maxx;
        kids[k].miny = (k < 2) ? it->miny : cy;
        kids[k].maxy = (k < 2) ? cy : it->maxy;
      }
      for (int i : it->idx) {
        int k = (xs[i] >= cx) + 2 * (ys[i] >= cy);
        kids[k].idx.push_back(i);
      }
      for (int k = 0; k < 4; ++k) {
        if (kids[k].idx.empty()) continue;
        kids[k].no_more = kids[k].idx.size() == 1;
        fresh.push_back(std::move(kids[k]));
      }
      it = nodes.erase(it);
      if ((int)(nodes.size() + fresh.size()) >= target) break;
    }
    nodes.splice(nodes.end(), fresh);
    if ((int)nodes.size() == prev_size) finished = true;  // no progress
    if ((int)nodes.size() >= target) finished = true;
  }

  // keep best-response keypoint per node
  int count = 0;
  for (auto& nd : nodes) {
    int best = nd.idx[0];
    float best_r = resp[best];
    for (int i : nd.idx) {
      if (resp[i] > best_r) {
        best_r = resp[i];
        best = i;
      }
    }
    out_idx[count++] = best;
    if (count >= n) break;
  }
  // cap at target by response ordering (reference retains best
  // vToDistributeKeys when nodes < target it keeps all)
  if (count > target) {
    std::partial_sort(out_idx, out_idx + target, out_idx + count,
                      [&](int a, int b) { return resp[a] > resp[b]; });
    count = target;
  }
  return count;
}

// ---------------------------------------------------------------------------
// Covisibility counting
// ---------------------------------------------------------------------------

// obs table: arrays pt[i], kf[i] of length m (every observation).
// Returns the number of distinct other-keyframes written; out arrays
// are (out_kf[j], out_count[j]).
int covisibility_counts(const int32_t* obs_pt, const int32_t* obs_kf, int m,
                        int query_kf, int max_kf, int32_t* out_kf,
                        int32_t* out_count) {
  // CSR by point: first pass count
  int32_t max_pt = -1;
  for (int i = 0; i < m; ++i) max_pt = std::max(max_pt, obs_pt[i]);
  if (max_pt < 0) return 0;
  std::vector<int32_t> start(max_pt + 2, 0);
  for (int i = 0; i < m; ++i) ++start[obs_pt[i] + 1];
  for (int p = 0; p < max_pt + 1; ++p) start[p + 1] += start[p];
  std::vector<int32_t> order(m);
  {
    std::vector<int32_t> cur(start.begin(), start.end() - 1);
    for (int i = 0; i < m; ++i) order[cur[obs_pt[i]]++] = i;
  }
  std::vector<int32_t> counts(max_kf + 1, 0);
  // for each obs of query_kf, walk its point's other observations
  for (int i = 0; i < m; ++i) {
    if (obs_kf[i] != query_kf) continue;
    int32_t p = obs_pt[i];
    for (int32_t j = start[p]; j < start[p + 1]; ++j) {
      int32_t okf = obs_kf[order[j]];
      if (okf != query_kf && okf <= max_kf) ++counts[okf];
    }
  }
  int out = 0;
  for (int k = 0; k <= max_kf; ++k)
    if (counts[k] > 0) {
      out_kf[out] = k;
      out_count[out] = counts[k];
      ++out;
    }
  return out;
}

// ---------------------------------------------------------------------------
// Distinctive descriptor (min-median Hamming)
// ---------------------------------------------------------------------------

static inline int popcount64(uint64_t x) { return __builtin_popcountll(x); }

// descs: o descriptors of w64 uint64 words each. Returns the index of
// the descriptor with the minimal median distance to the others.
int distinctive_descriptor(const uint64_t* descs, int o, int w64) {
  if (o <= 0) return -1;
  if (o == 1) return 0;
  std::vector<int> dist(o * o, 0);
  for (int i = 0; i < o; ++i)
    for (int j = i + 1; j < o; ++j) {
      int d = 0;
      for (int k = 0; k < w64; ++k)
        d += popcount64(descs[i * w64 + k] ^ descs[j * w64 + k]);
      dist[i * o + j] = d;
      dist[j * o + i] = d;
    }
  int best = 0, best_med = 1 << 30;
  std::vector<int> row(o);
  for (int i = 0; i < o; ++i) {
    std::memcpy(row.data(), &dist[i * o], o * sizeof(int));
    std::nth_element(row.begin(), row.begin() + o / 2, row.end());
    int med = row[o / 2];
    if (med < best_med) {
      best_med = med;
      best = i;
    }
  }
  return best;
}

// descs: packed observation descriptors, segment p = rows
// [offsets[p], offsets[p+1]) of w64 uint64 words each. Writes, per
// segment, the SEGMENT-RELATIVE index of its min-median-Hamming row
// (-1 for empty segments). One call covers every point touched by a
// mapping pass (cMapPoint::ComputeDistinctiveDescriptors batched).
int distinctive_descriptors_batch(const uint64_t* descs,
                                  const int32_t* offsets, int n_pts, int w64,
                                  int32_t* out_best) {
  for (int p = 0; p < n_pts; ++p) {
    const int s = offsets[p], e = offsets[p + 1];
    const int o = e - s;
    if (o <= 0) {
      out_best[p] = -1;
      continue;
    }
    out_best[p] = distinctive_descriptor(descs + (size_t)s * w64, o, w64);
  }
  return n_pts;
}

// ---------------------------------------------------------------------------
// Inverted-file shared-word counting
// ---------------------------------------------------------------------------

// inv_csr: for word w, keyframes inv_kf[inv_start[w] .. inv_start[w+1])
// query: q words. Accumulates counts per keyframe (excluding the
// exclude list). Returns number of (kf, count) pairs written.
int shared_word_counts(const int32_t* inv_start, const int32_t* inv_kf,
                       int n_words, const int32_t* query, int q,
                       const int32_t* exclude, int n_excl, int max_kf,
                       int32_t* out_kf, int32_t* out_count) {
  std::vector<int32_t> counts(max_kf + 1, 0);
  std::vector<uint8_t> excl(max_kf + 1, 0);
  for (int i = 0; i < n_excl; ++i)
    if (exclude[i] >= 0 && exclude[i] <= max_kf) excl[exclude[i]] = 1;
  for (int i = 0; i < q; ++i) {
    int32_t w = query[i];
    if (w < 0 || w >= n_words) continue;
    for (int32_t j = inv_start[w]; j < inv_start[w + 1]; ++j) {
      int32_t kf = inv_kf[j];
      if (kf >= 0 && kf <= max_kf && !excl[kf]) ++counts[kf];
    }
  }
  int out = 0;
  for (int k = 0; k <= max_kf; ++k)
    if (counts[k] > 0) {
      out_kf[out] = k;
      out_count[out] = counts[k];
      ++out;
    }
  return out;
}

}  // extern "C"
