// Native BVH builder — binned SAH BVH2 packed into TPU meganode rows.
//
// Role parity with HIPRT's native hiprtBuildGeometry (the reference's BVH
// build is C++/HIP: src/HIPRT-Orochi/HIPRTScene.h:60-87). The Python/numpy
// builder in ../build.py is the readable specification; this C++ port removes
// the per-node Python overhead for million-triangle (Bistro-class) scenes.
//
// Emits exactly the meganode layout consumed by ops/traverse.py:
//   [ 0:12]  child AABBs (c0.min, c0.max, c1.min, c1.max)
//   [12:16]  child meta (int32 bits): c0_ref, c0_count, c1_ref, c1_count
//   [16:52]  child-0 leaf triangles 4 x (v0, e1, e2)  (NaN padded)
//   [52:88]  child-1 leaf triangles
//   [88:96]  leaf prim ids (int32 bits, -1 padded)
//   [96:128] zero pad
//
// C ABI for ctypes. Built on demand by native.py with g++ -O2.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr int N_BINS = 16;
constexpr int ROW_WIDTH = 128;

struct Vec3 {
  float x, y, z;
};

static inline Vec3 vmin(const Vec3 &a, const Vec3 &b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
static inline Vec3 vmax(const Vec3 &a, const Vec3 &b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}
static inline float area(const Vec3 &mn, const Vec3 &mx) {
  float dx = std::max(0.f, mx.x - mn.x);
  float dy = std::max(0.f, mx.y - mn.y);
  float dz = std::max(0.f, mx.z - mn.z);
  return 2.f * (dx * dy + dy * dz + dz * dx);
}

struct Node {
  Vec3 bmin, bmax;
  int32_t left;   // internal: left child id; leaf: start into order
  int32_t count;  // 0 internal, >0 leaf
};

struct Builder {
  const float *verts;
  const int32_t *tris;
  int64_t n_tris;
  int max_leaf;
  std::vector<Vec3> tri_min, tri_max, centroid;
  std::vector<int64_t> order;
  std::vector<Node> nodes;

  void build() {
    tri_min.resize(n_tris);
    tri_max.resize(n_tris);
    centroid.resize(n_tris);
    order.resize(n_tris);
    for (int64_t t = 0; t < n_tris; ++t) {
      Vec3 v0 = vert(tris[3 * t]);
      Vec3 v1 = vert(tris[3 * t + 1]);
      Vec3 v2 = vert(tris[3 * t + 2]);
      tri_min[t] = vmin(v0, vmin(v1, v2));
      tri_max[t] = vmax(v0, vmax(v1, v2));
      centroid[t] = {(tri_min[t].x + tri_max[t].x) * 0.5f,
                     (tri_min[t].y + tri_max[t].y) * 0.5f,
                     (tri_min[t].z + tri_max[t].z) * 0.5f};
      order[t] = t;
    }
    nodes.reserve(2 * n_tris);
    nodes.push_back({});
    struct Item {
      int32_t node;
      int64_t start, end;
    };
    std::vector<Item> stack{{0, 0, n_tris}};
    while (!stack.empty()) {
      Item it = stack.back();
      stack.pop_back();
      build_node(it.node, it.start, it.end, stack);
    }
  }

  Vec3 vert(int32_t i) const {
    return {verts[3 * i], verts[3 * i + 1], verts[3 * i + 2]};
  }

  template <typename StackT>
  void build_node(int32_t node_id, int64_t start, int64_t end, StackT &stack) {
    Vec3 bmin = {1e30f, 1e30f, 1e30f}, bmax = {-1e30f, -1e30f, -1e30f};
    Vec3 cmin = bmin, cmax = bmax;
    for (int64_t i = start; i < end; ++i) {
      int64_t t = order[i];
      bmin = vmin(bmin, tri_min[t]);
      bmax = vmax(bmax, tri_max[t]);
      cmin = vmin(cmin, centroid[t]);
      cmax = vmax(cmax, centroid[t]);
    }
    Node &n = nodes[node_id];
    n.bmin = bmin;
    n.bmax = bmax;
    int64_t count = end - start;
    if (count <= max_leaf) {
      n.left = (int32_t)start;
      n.count = (int32_t)count;
      return;
    }

    float ext[3] = {cmax.x - cmin.x, cmax.y - cmin.y, cmax.z - cmin.z};
    int axis = 0;
    if (ext[1] > ext[axis]) axis = 1;
    if (ext[2] > ext[axis]) axis = 2;
    int64_t mid = -1;
    if (ext[axis] > 1e-12f) {
      float cmin_a = axis == 0 ? cmin.x : (axis == 1 ? cmin.y : cmin.z);
      float scale = N_BINS / ext[axis];
      int64_t bin_count[N_BINS] = {};
      Vec3 bin_min[N_BINS], bin_max[N_BINS];
      for (int b = 0; b < N_BINS; ++b) {
        bin_min[b] = {1e30f, 1e30f, 1e30f};
        bin_max[b] = {-1e30f, -1e30f, -1e30f};
      }
      auto bin_of = [&](int64_t t) {
        float c = axis == 0 ? centroid[t].x
                            : (axis == 1 ? centroid[t].y : centroid[t].z);
        int b = (int)((c - cmin_a) * scale);
        return std::min(b, N_BINS - 1);
      };
      for (int64_t i = start; i < end; ++i) {
        int64_t t = order[i];
        int b = bin_of(t);
        bin_count[b]++;
        bin_min[b] = vmin(bin_min[b], tri_min[t]);
        bin_max[b] = vmax(bin_max[b], tri_max[t]);
      }
      // prefix/suffix sweeps
      Vec3 lmin[N_BINS], lmax[N_BINS], rmin[N_BINS], rmax[N_BINS];
      int64_t lcnt[N_BINS], rcnt[N_BINS];
      Vec3 accMin = {1e30f, 1e30f, 1e30f}, accMax = {-1e30f, -1e30f, -1e30f};
      int64_t acc = 0;
      for (int b = 0; b < N_BINS; ++b) {
        accMin = vmin(accMin, bin_min[b]);
        accMax = vmax(accMax, bin_max[b]);
        acc += bin_count[b];
        lmin[b] = accMin;
        lmax[b] = accMax;
        lcnt[b] = acc;
      }
      accMin = {1e30f, 1e30f, 1e30f};
      accMax = {-1e30f, -1e30f, -1e30f};
      acc = 0;
      for (int b = N_BINS - 1; b >= 0; --b) {
        accMin = vmin(accMin, bin_min[b]);
        accMax = vmax(accMax, bin_max[b]);
        acc += bin_count[b];
        rmin[b] = accMin;
        rmax[b] = accMax;
        rcnt[b] = acc;
      }
      float best_cost = std::numeric_limits<float>::infinity();
      int best = -1;
      for (int s = 0; s < N_BINS - 1; ++s) {
        if (!lcnt[s] || !rcnt[s + 1]) continue;
        float c = area(lmin[s], lmax[s]) * lcnt[s] +
                  area(rmin[s + 1], rmax[s + 1]) * rcnt[s + 1];
        if (c < best_cost) {
          best_cost = c;
          best = s;
        }
      }
      if (best >= 0) {
        auto pred = [&](int64_t t) { return bin_of(t) <= best; };
        int64_t *first = order.data() + start;
        int64_t *last = order.data() + end;
        int64_t *split = std::partition(first, last, pred);
        int64_t nleft = split - first;
        if (nleft > 0 && nleft < count) mid = start + nleft;
      }
    }
    if (mid < 0) mid = start + count / 2;

    int32_t left_id = (int32_t)nodes.size();
    nodes.push_back({});
    nodes.push_back({});
    nodes[node_id].left = left_id;
    nodes[node_id].count = 0;
    stack.push_back({left_id, start, mid});
    stack.push_back({(int32_t)(left_id + 1), mid, end});
  }
};

}  // namespace

extern "C" {

// Returns the number of meganode rows written, or -1 if cap_rows is too small.
// rows: cap_rows * 128 floats, caller-allocated.
int64_t hpt_build_bvh(const float *vertices, int64_t n_verts,
                      const int32_t *triangles, int64_t n_tris, int max_leaf,
                      float *rows, int64_t cap_rows) {
  (void)n_verts;
  Builder b{vertices, triangles, n_tris, max_leaf};
  b.build();

  // map internal node ids
  std::vector<int32_t> id_map(b.nodes.size(), -1);
  int64_t n_internal = 0;
  for (size_t i = 0; i < b.nodes.size(); ++i)
    if (b.nodes[i].count == 0) id_map[i] = (int32_t)n_internal++;
  int64_t out_rows = std::max<int64_t>(n_internal, 1);
  if (out_rows > cap_rows) return -1;
  std::memset(rows, 0, (size_t)out_rows * ROW_WIDTH * sizeof(float));

  const float NaN = std::numeric_limits<float>::quiet_NaN();
  auto emit_leaf = [&](float *row, int ci, const Node &leaf) {
    float *tri_dst = row + 16 + ci * 36;
    int32_t prims[4] = {-1, -1, -1, -1};
    for (int k = 0; k < 36; ++k) tri_dst[k] = NaN;
    for (int k = 0; k < leaf.count && k < 4; ++k) {
      int64_t t = b.order[leaf.left + k];
      Vec3 v0 = b.vert(b.tris[3 * t]);
      Vec3 v1 = b.vert(b.tris[3 * t + 1]);
      Vec3 v2 = b.vert(b.tris[3 * t + 2]);
      float *d = tri_dst + 9 * k;
      d[0] = v0.x; d[1] = v0.y; d[2] = v0.z;
      d[3] = v1.x - v0.x; d[4] = v1.y - v0.y; d[5] = v1.z - v0.z;
      d[6] = v2.x - v0.x; d[7] = v2.y - v0.y; d[8] = v2.z - v0.z;
      prims[k] = (int32_t)t;
    }
    std::memcpy(row + 88 + ci * 4, prims, 4 * sizeof(int32_t));
  };

  if (n_internal == 0) {
    // degenerate: single leaf root (see build.py degenerate case)
    float *row = rows;
    const Node &root = b.nodes[0];
    row[0] = root.bmin.x; row[1] = root.bmin.y; row[2] = root.bmin.z;
    row[3] = root.bmax.x; row[4] = root.bmax.y; row[5] = root.bmax.z;
    int32_t meta[4] = {0, root.count, 0, -1};
    emit_leaf(row, 0, root);
    std::memcpy(row + 12, meta, 4 * sizeof(int32_t));
    return 1;
  }

  for (size_t i = 0; i < b.nodes.size(); ++i) {
    if (b.nodes[i].count != 0) continue;
    float *row = rows + (size_t)id_map[i] * ROW_WIDTH;
    const Node &c0 = b.nodes[b.nodes[i].left];
    const Node &c1 = b.nodes[b.nodes[i].left + 1];
    row[0] = c0.bmin.x; row[1] = c0.bmin.y; row[2] = c0.bmin.z;
    row[3] = c0.bmax.x; row[4] = c0.bmax.y; row[5] = c0.bmax.z;
    row[6] = c1.bmin.x; row[7] = c1.bmin.y; row[8] = c1.bmin.z;
    row[9] = c1.bmax.x; row[10] = c1.bmax.y; row[11] = c1.bmax.z;
    int32_t meta[4];
    const Node *cs[2] = {&c0, &c1};
    for (int ci = 0; ci < 2; ++ci) {
      if (cs[ci]->count > 0) {
        meta[2 * ci] = 0;
        meta[2 * ci + 1] = cs[ci]->count;
        emit_leaf(row, ci, *cs[ci]);
      } else {
        meta[2 * ci] = id_map[b.nodes[i].left + ci];
        meta[2 * ci + 1] = 0;
      }
    }
    std::memcpy(row + 12, meta, 4 * sizeof(int32_t));
  }
  return out_rows;
}


// Raw BVH2 export: node bounds + (left,count) meta + triangle order, with
// arbitrary max_leaf (the meganode packer above is fixed at <=4 embedded
// tris; the compact/fat-leaf layouts pack host-side from these arrays).
// Returns node count, or -1 if cap_nodes is too small.
int64_t hpt_build_bvh_raw(const float *vertices, int64_t n_verts,
                          const int32_t *triangles, int64_t n_tris,
                          int max_leaf, float *node_bounds,
                          int32_t *node_meta, int64_t cap_nodes,
                          int64_t *order_out) {
  (void)n_verts;
  Builder b{vertices, triangles, n_tris, max_leaf};
  if (n_tris <= 0) return 0;
  b.build();
  int64_t n_nodes = (int64_t)b.nodes.size();
  if (n_nodes > cap_nodes) return -1;
  for (int64_t i = 0; i < n_nodes; ++i) {
    const Node &n = b.nodes[i];
    node_bounds[i * 6 + 0] = n.bmin.x;
    node_bounds[i * 6 + 1] = n.bmin.y;
    node_bounds[i * 6 + 2] = n.bmin.z;
    node_bounds[i * 6 + 3] = n.bmax.x;
    node_bounds[i * 6 + 4] = n.bmax.y;
    node_bounds[i * 6 + 5] = n.bmax.z;
    node_meta[i * 2 + 0] = n.left;
    node_meta[i * 2 + 1] = n.count;
  }
  for (int64_t t = 0; t < n_tris; ++t) order_out[t] = b.order[t];
  return n_nodes;
}

}  // extern "C"
