// Native binned-SAH BVH builder (host-side).
//
// The reference gets a high-quality acceleration structure from the Vulkan
// driver (PREFER_FAST_TRACE, resource_manager.cpp:593-701); the TPU build does
// that work itself at scene load.  The LBVH (lbvh.cpp / ops/bvh.py) stays as
// the in-jit refit/rebuild path for animated scenes; this builder produces a
// much shorter expected traversal path for static scenes (binned SAH, 16 bins,
// single-triangle leaves) in the exact same array layout:
//   left/right/escape/leaf_tri: (2n-1) i32, order: (n) i32,
//   aabb_min/aabb_max: (2n-1, 3) f32, root = node 0, leaf_tri = index into
//   `order` (leaf_size == 1).  Escape links thread the skip-pointer traversal
//   (ops/traverse.py); per-octant ordered links are derived on device
//   (ops/bvh.with_octant_links).
//
// Build: native/Makefile -> libvhr_native.so, loaded via ctypes
// (vulkanhybridrenderer_tpu/native_bridge.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kBins = 16;

struct AABB {
    float lo[3] = {1e30f, 1e30f, 1e30f};
    float hi[3] = {-1e30f, -1e30f, -1e30f};
    void grow(const AABB& o) {
        for (int a = 0; a < 3; ++a) {
            lo[a] = std::min(lo[a], o.lo[a]);
            hi[a] = std::max(hi[a], o.hi[a]);
        }
    }
    float half_area() const {
        float dx = std::max(hi[0] - lo[0], 0.f);
        float dy = std::max(hi[1] - lo[1], 0.f);
        float dz = std::max(hi[2] - lo[2], 0.f);
        return dx * dy + dy * dz + dz * dx;
    }
};

struct BuildCtx {
    const float* cen;        // (n, 3) triangle centroids
    const AABB* boxes;       // (n) triangle AABBs
    int32_t* ids;            // mutable triangle id scratch, partitioned in place
    // outputs
    int32_t* left;
    int32_t* right;
    int32_t* leaf_tri;
    int32_t* order;
    float* amin;
    float* amax;
    int num_internal = 0;    // = n - 1
    int next_internal = 0;
    int next_leaf = 0;
};

// Builds the subtree over ids[first, first+count); returns its node id and
// writes its AABB to *out_box.  Node ids follow the ops/bvh.py layout so
// refit() works unchanged: internal nodes 0..n-2 (preorder, root = 0), leaf
// for order-slot k = (n-1) + k.
int build_range(BuildCtx& c, int first, int count, AABB* out_box, int depth = 0) {
    int node = (count == 1) ? c.num_internal + c.next_leaf : c.next_internal++;
    AABB box, cbox;
    for (int i = first; i < first + count; ++i) {
        box.grow(c.boxes[c.ids[i]]);
        const float* p = &c.cen[c.ids[i] * 3];
        for (int a = 0; a < 3; ++a) {
            cbox.lo[a] = std::min(cbox.lo[a], p[a]);
            cbox.hi[a] = std::max(cbox.hi[a], p[a]);
        }
    }
    for (int a = 0; a < 3; ++a) {
        c.amin[node * 3 + a] = box.lo[a];
        c.amax[node * 3 + a] = box.hi[a];
    }
    *out_box = box;

    if (count == 1) {
        int slot = c.next_leaf++;
        c.order[slot] = c.ids[first];
        c.leaf_tri[node] = slot;
        c.left[node] = c.right[node] = -1;
        return node;
    }

    // binned SAH over the largest centroid-extent axis
    int axis = 0;
    float best_ext = -1.f;
    for (int a = 0; a < 3; ++a) {
        float e = cbox.hi[a] - cbox.lo[a];
        if (e > best_ext) { best_ext = e; axis = a; }
    }
    int mid = first + count / 2;  // fallback: median split
    // depth guard: past 60 levels force median splits (halving bounds total
    // depth ~60+log2(n)), so degenerate SAH partitions can't blow the C stack
    if (best_ext > 1e-12f && depth < 60) {
        AABB bin_box[kBins];
        int bin_cnt[kBins] = {0};
        const float scale = kBins / best_ext;
        auto bin_of = [&](int id) {
            int b = static_cast<int>((c.cen[id * 3 + axis] - cbox.lo[axis]) * scale);
            return b < 0 ? 0 : (b >= kBins ? kBins - 1 : b);
        };
        for (int i = first; i < first + count; ++i) {
            int b = bin_of(c.ids[i]);
            bin_box[b].grow(c.boxes[c.ids[i]]);
            bin_cnt[b]++;
        }
        // sweep: right-to-left suffix areas, then left-to-right prefix
        float rarea[kBins + 1];
        int rcnt[kBins + 1];
        AABB acc;
        rarea[kBins] = 0.f;
        rcnt[kBins] = 0;
        for (int b = kBins - 1; b >= 0; --b) {
            acc.grow(bin_box[b]);
            rarea[b] = acc.half_area();
            rcnt[b] = rcnt[b + 1] + bin_cnt[b];
        }
        AABB lacc;
        int lcnt = 0;
        float best_cost = 1e30f;
        int best_split = -1;
        for (int b = 0; b < kBins - 1; ++b) {
            lacc.grow(bin_box[b]);
            lcnt += bin_cnt[b];
            if (lcnt == 0 || lcnt == count) continue;
            float cost = lacc.half_area() * lcnt + rarea[b + 1] * (count - lcnt);
            if (cost < best_cost) { best_cost = cost; best_split = b; }
        }
        if (best_split >= 0) {
            int32_t* b0 = c.ids + first;
            int32_t* b1 = std::partition(b0, b0 + count, [&](int id) {
                return bin_of(id) <= best_split;
            });
            int lc = static_cast<int>(b1 - b0);
            if (lc > 0 && lc < count) mid = first + lc;
            else {
                // degenerate binning (all centroids in one bin): median on axis
                std::nth_element(b0, b0 + count / 2, b0 + count, [&](int x, int y) {
                    return c.cen[x * 3 + axis] < c.cen[y * 3 + axis];
                });
                mid = first + count / 2;
            }
        } else {
            std::nth_element(c.ids + first, c.ids + first + count / 2,
                             c.ids + first + count, [&](int x, int y) {
                                 return c.cen[x * 3 + axis] < c.cen[y * 3 + axis];
                             });
        }
    }

    if (depth >= 60) {
        std::nth_element(c.ids + first, c.ids + first + count / 2,
                         c.ids + first + count, [&](int x, int y) {
                             return c.cen[x * 3 + axis] < c.cen[y * 3 + axis];
                         });
        mid = first + count / 2;
    }
    AABB lb, rb;
    int lc = build_range(c, first, mid - first, &lb, depth + 1);
    int rc = build_range(c, mid, first + count - mid, &rb, depth + 1);
    c.left[node] = lc;
    c.right[node] = rc;
    c.leaf_tri[node] = -1;
    return node;
}

}  // namespace

extern "C" {

// tris: (n, 9) f32.  Outputs as lbvh_build but root = node 0 and leaf_tri holds
// an index into `order` (leaf_size == 1 semantics of ops/bvh.BVH).
int sah_build(const float* tris, int n,
              int32_t* left, int32_t* right, int32_t* escape, int32_t* leaf_tri,
              int32_t* order, float* aabb_min, float* aabb_max) {
    if (n < 1) return 1;
    const float pad = 1e-6f;
    std::vector<AABB> boxes(n);
    std::vector<float> cen(3 * n);
    for (int t = 0; t < n; ++t) {
        for (int a = 0; a < 3; ++a) {
            float v0 = tris[t * 9 + a];
            float v1 = tris[t * 9 + 3 + a];
            float v2 = tris[t * 9 + 6 + a];
            boxes[t].lo[a] = std::min(v0, std::min(v1, v2)) - pad;
            boxes[t].hi[a] = std::max(v0, std::max(v1, v2)) + pad;
            cen[t * 3 + a] = 0.5f * (boxes[t].lo[a] + boxes[t].hi[a]);
        }
    }
    std::vector<int32_t> ids(n);
    for (int i = 0; i < n; ++i) ids[i] = i;

    BuildCtx c{cen.data(), boxes.data(), ids.data(),
               left, right, leaf_tri, order, aabb_min, aabb_max, n - 1};
    AABB root_box;
    build_range(c, 0, n, &root_box);

    // escape links: left child -> right sibling, right child -> parent's escape
    const int total = 2 * n - 1;
    escape[0] = -1;
    std::vector<int32_t> stack{0};
    while (!stack.empty()) {
        int i = stack.back();
        stack.pop_back();
        if (left[i] < 0) continue;
        escape[left[i]] = right[i];
        escape[right[i]] = escape[i];
        stack.push_back(left[i]);
        stack.push_back(right[i]);
    }
    (void)total;
    return 0;
}

}  // extern "C"
