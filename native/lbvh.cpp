// Native LBVH builder (host-side).
//
// C++ counterpart of the device-side builder in vulkanhybridrenderer_tpu/ops/bvh.py,
// mirroring the role of the reference's C++-driven acceleration-structure build
// (resource_manager.cpp:593-801: BLAS/TLAS built by host code at scene load).
// Used for large static scenes where a fast host build at load time beats tracing
// the build through XLA; produces the exact same array layout as ops/bvh.py
// (2N-1 nodes, skip-pointer threaded, leaves N-1..2N-2 in morton order).
//
// Algorithm: Karras 2012 parallel radix tree, built sequentially here (the host is
// latency-bound anyway) with the same delta/tie-break conventions as the jnp
// implementation so both builders yield identical trees.
//
// Build: see native/Makefile -> libvhr_native.so, loaded via ctypes
// (vulkanhybridrenderer_tpu/native_bridge.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

inline uint32_t expand_bits(uint32_t v) {
    v = (v * 0x00010001u) & 0xFF0000FFu;
    v = (v * 0x00000101u) & 0x0F00F00Fu;
    v = (v * 0x00000011u) & 0xC30C30C3u;
    v = (v * 0x00000005u) & 0x49249249u;
    return v;
}

inline uint32_t morton3(float x, float y, float z) {
    auto q = [](float f) {
        float c = f < 0.f ? 0.f : (f > 1.f ? 1.f : f);
        uint32_t v = static_cast<uint32_t>(c * 1024.0f);
        return v > 1023u ? 1023u : v;
    };
    return (expand_bits(q(x)) << 2) | (expand_bits(q(y)) << 1) | expand_bits(q(z));
}

inline int clz32(uint32_t x) { return x == 0 ? 32 : __builtin_clz(x); }

struct Builder {
    int n;
    const uint32_t* codes;  // sorted

    // common-prefix length with the same index tie-break as ops/bvh.py
    int delta(int i, int j) const {
        if (j < 0 || j >= n) return -1;
        uint32_t x = codes[i] ^ codes[j];
        if (x == 0) return 32 + clz32(static_cast<uint32_t>(i ^ j));
        return clz32(x);
    }
};

}  // namespace

extern "C" {

// tris: (n, 9) float32 triangle vertices (xyz * 3).
// Outputs sized: left/right/escape/leaf_tri: 2n-1 int32; order: n int32;
// aabb_min/aabb_max: (2n-1, 3) float32.
// Returns 0 on success.
int lbvh_build(const float* tris, int n,
               int32_t* left, int32_t* right, int32_t* escape, int32_t* leaf_tri,
               int32_t* order, float* aabb_min, float* aabb_max) {
    if (n < 1) return 1;
    const float pad = 1e-6f;
    std::vector<float> lo(3 * n), hi(3 * n), cen(3 * n);
    float scene_lo[3] = {1e30f, 1e30f, 1e30f};
    float scene_hi[3] = {-1e30f, -1e30f, -1e30f};
    for (int t = 0; t < n; ++t) {
        for (int a = 0; a < 3; ++a) {
            float v0 = tris[t * 9 + a];
            float v1 = tris[t * 9 + 3 + a];
            float v2 = tris[t * 9 + 6 + a];
            float l = std::min(v0, std::min(v1, v2)) - pad;
            float h = std::max(v0, std::max(v1, v2)) + pad;
            lo[t * 3 + a] = l;
            hi[t * 3 + a] = h;
            cen[t * 3 + a] = 0.5f * (l + h);
            scene_lo[a] = std::min(scene_lo[a], l);
            scene_hi[a] = std::max(scene_hi[a], h);
        }
    }
    std::vector<uint32_t> codes(n);
    for (int t = 0; t < n; ++t) {
        float nx[3];
        for (int a = 0; a < 3; ++a) {
            float ext = std::max(scene_hi[a] - scene_lo[a], 1e-12f);
            nx[a] = (cen[t * 3 + a] - scene_lo[a]) / ext;
        }
        codes[t] = morton3(nx[0], nx[1], nx[2]);
    }
    // stable sort by code (matches jnp.argsort(stable))
    std::vector<int32_t> ord(n);
    std::iota(ord.begin(), ord.end(), 0);
    std::stable_sort(ord.begin(), ord.end(),
                     [&](int a, int b) { return codes[a] < codes[b]; });
    std::vector<uint32_t> sorted_codes(n);
    for (int i = 0; i < n; ++i) sorted_codes[i] = codes[ord[i]];
    std::memcpy(order, ord.data(), n * sizeof(int32_t));

    const int total = 2 * n - 1;
    const int num_internal = n - 1;
    for (int i = 0; i < total; ++i) {
        left[i] = right[i] = escape[i] = leaf_tri[i] = -1;
    }
    for (int k = 0; k < n; ++k) leaf_tri[num_internal + k] = ord[k];

    if (n == 1) {
        for (int a = 0; a < 3; ++a) {
            aabb_min[a] = lo[a];
            aabb_max[a] = hi[a];
        }
        return 0;
    }

    Builder B{n, sorted_codes.data()};
    std::vector<int32_t> parent(total, -1);
    for (int i = 0; i < num_internal; ++i) {
        int d = B.delta(i, i + 1) - B.delta(i, i - 1);
        d = d > 0 ? 1 : -1;
        int delta_min = B.delta(i, i - d);
        // range length via doubling + binary search (same as the jnp version)
        int lmax = 2;
        while (B.delta(i, i + lmax * d) > delta_min) lmax <<= 1;
        int l = 0;
        for (int t = lmax >> 1; t >= 1; t >>= 1) {
            if (B.delta(i, i + (l + t) * d) > delta_min) l += t;
        }
        int j = i + l * d;
        int delta_node = B.delta(i, j);
        int s = 0, t = l;
        do {
            t = (t + 1) >> 1;
            if (B.delta(i, i + (s + t) * d) > delta_node) s += t;
        } while (t > 1);
        int gamma = i + s * d + std::min(d, 0);
        int lo_r = std::min(i, j);
        int hi_r = std::max(i, j);
        int lc = (lo_r == gamma) ? gamma + num_internal : gamma;
        int rc = (hi_r == gamma + 1) ? gamma + 1 + num_internal : gamma + 1;
        left[i] = lc;
        right[i] = rc;
        parent[lc] = i;
        parent[rc] = i;
    }

    // escape links: left child -> right sibling; right child -> parent's escape.
    // Topological top-down: children of i resolved once escape[i] known; iterate
    // from the root (node 0) via explicit stack.
    {
        std::vector<int32_t> stack;
        stack.push_back(0);
        escape[0] = -1;
        while (!stack.empty()) {
            int i = stack.back();
            stack.pop_back();
            if (left[i] < 0) continue;  // leaf
            escape[left[i]] = right[i];
            escape[right[i]] = escape[i];
            stack.push_back(left[i]);
            stack.push_back(right[i]);
        }
    }

    // AABBs: leaves then bottom-up (children always have higher post-order; do a
    // reverse topological pass via recursion-free stack)
    for (int k = 0; k < n; ++k) {
        int t = ord[k];
        for (int a = 0; a < 3; ++a) {
            aabb_min[(num_internal + k) * 3 + a] = lo[t * 3 + a];
            aabb_max[(num_internal + k) * 3 + a] = hi[t * 3 + a];
        }
    }
    {
        // count-down approach: process internal nodes once both children done
        std::vector<int> pending(num_internal, 2);
        std::vector<int32_t> ready;
        ready.reserve(total);
        for (int k = 0; k < n; ++k) ready.push_back(num_internal + k);
        size_t head = 0;
        while (head < ready.size()) {
            int node = ready[head++];
            int p = parent[node];
            if (p < 0) continue;
            if (--pending[p] == 0) {
                for (int a = 0; a < 3; ++a) {
                    aabb_min[p * 3 + a] =
                        std::min(aabb_min[left[p] * 3 + a], aabb_min[right[p] * 3 + a]);
                    aabb_max[p * 3 + a] =
                        std::max(aabb_max[left[p] * 3 + a], aabb_max[right[p] * 3 + a]);
                }
                ready.push_back(p);
            }
        }
    }
    return 0;
}

// Refit only (topology fixed): recompute AABBs for new triangle positions.
int lbvh_refit(const float* tris, int n,
               const int32_t* left, const int32_t* right, const int32_t* leaf_tri,
               float* aabb_min, float* aabb_max) {
    if (n < 1) return 1;
    const float pad = 1e-6f;
    const int num_internal = n - 1;
    const int total = 2 * n - 1;
    std::vector<int32_t> parent(total, -1);
    for (int i = 0; i < num_internal; ++i) {
        parent[left[i]] = i;
        parent[right[i]] = i;
    }
    for (int k = 0; k < n; ++k) {
        int t = leaf_tri[num_internal + k];
        for (int a = 0; a < 3; ++a) {
            float v0 = tris[t * 9 + a], v1 = tris[t * 9 + 3 + a], v2 = tris[t * 9 + 6 + a];
            aabb_min[(num_internal + k) * 3 + a] = std::min(v0, std::min(v1, v2)) - pad;
            aabb_max[(num_internal + k) * 3 + a] = std::max(v0, std::max(v1, v2)) + pad;
        }
    }
    if (n == 1) return 0;
    std::vector<int> pending(num_internal, 2);
    std::vector<int32_t> ready;
    ready.reserve(total);
    for (int k = 0; k < n; ++k) ready.push_back(num_internal + k);
    size_t head = 0;
    while (head < ready.size()) {
        int node = ready[head++];
        int p = parent[node];
        if (p < 0) continue;
        if (--pending[p] == 0) {
            for (int a = 0; a < 3; ++a) {
                aabb_min[p * 3 + a] =
                    std::min(aabb_min[left[p] * 3 + a], aabb_min[right[p] * 3 + a]);
                aabb_max[p * 3 + a] =
                    std::max(aabb_max[left[p] * 3 + a], aabb_max[right[p] * 3 + a]);
            }
            ready.push_back(p);
        }
    }
    return 0;
}

}  // extern "C"
