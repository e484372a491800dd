// BVH8 collapse: binary BVH -> 8-wide gather-table rows (ops/bvh8.py layout).
//
// Mirrors vulkanhybridrenderer_tpu/ops/bvh8.build_bvh8_host EXACTLY (same
// greedy expansion, first-fit-decreasing leaf packing, centroid-octant slot
// probing, and traversal/allocation order) so the output arrays are
// bit-identical to the Python host builder -- tests/test_native.py asserts
// this.  Native build keeps large-scene load times flat (the Python collapse
// walks ~100k nodes per million triangles).
//
// Row layout: see ops/bvh8.py ("internal: 8 child AABBs slot-major + base +
// 3-bit offset map; leaf: 8 inlined triangles + ids; col 127 = leaf flag").
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {


constexpr int NF = 128;

struct Bin {
    bool leaf = false;
    int node = -1;            // internal bin: binary node
    std::vector<int> roots;   // leaf bin: packed subtree roots
    float lo[3], hi[3];
};

struct Ctx {
    int leaf_max;
    const int32_t* left;
    const int32_t* right;
    const int32_t* leaf_tri;  // start index into order, -1 internal
    const int32_t* order;
    const float* amin;        // (total, 3)
    const float* amax;
    const float* tris;        // (T, 9)
    int leaf_size;
    std::vector<int64_t> count;
};

void subtree_counts(Ctx& c, int total) {
    c.count.assign(total, 0);
    // iterative post-order via reverse scan won't work for arbitrary layouts;
    // use an explicit stack
    std::vector<int> stack{0};
    std::vector<int> po;
    po.reserve(total);
    // root is node 0 for the SAH builder; LBVH also uses 0 when n > 1
    while (!stack.empty()) {
        int n = stack.back();
        stack.pop_back();
        po.push_back(n);
        if (c.leaf_tri[n] < 0) {
            stack.push_back(c.left[n]);
            stack.push_back(c.right[n]);
        }
    }
    for (int i = (int)po.size() - 1; i >= 0; --i) {
        int n = po[i];
        if (c.leaf_tri[n] >= 0) {
            int64_t cnt = 0;
            for (int j = 0; j < c.leaf_size; ++j)
                if (c.order[c.leaf_tri[n] + j] >= 0) ++cnt;
            c.count[n] = cnt;
        } else {
            c.count[n] = c.count[c.left[n]] + c.count[c.right[n]];
        }
    }
}

void collect_tris(const Ctx& c, int node, std::vector<int>& out) {
    std::vector<int> stack{node};
    while (!stack.empty()) {
        int n = stack.back();
        stack.pop_back();
        if (c.leaf_tri[n] >= 0) {
            for (int j = 0; j < c.leaf_size; ++j) {
                int t = c.order[c.leaf_tri[n] + j];
                if (t >= 0) out.push_back(t);
            }
        } else {
            stack.push_back(c.left[n]);
            stack.push_back(c.right[n]);
        }
    }
}

std::vector<Bin> make_bins(const Ctx& c, int node) {
    std::vector<int> roots{node};
    while (true) {
        // pack: big bins first (roots order), then FFD leaf packs
        std::vector<Bin> bins;
        std::vector<int> small;
        for (int r : roots)
            if (c.count[r] > c.leaf_max) {
                Bin b;
                b.leaf = false;
                b.node = r;
                for (int a = 0; a < 3; ++a) {
                    b.lo[a] = c.amin[3 * r + a];
                    b.hi[a] = c.amax[3 * r + a];
                }
                bins.push_back(std::move(b));
            } else {
                small.push_back(r);
            }
        std::stable_sort(small.begin(), small.end(), [&](int a, int b) {
            return c.count[a] > c.count[b];
        });
        std::vector<std::pair<int64_t, std::vector<int>>> packs;
        for (int r : small) {
            bool placed = false;
            for (auto& p : packs)
                if (p.first + c.count[r] <= c.leaf_max) {
                    p.first += c.count[r];
                    p.second.push_back(r);
                    placed = true;
                    break;
                }
            if (!placed) packs.push_back({c.count[r], {r}});
        }
        for (auto& p : packs) {
            Bin b;
            b.leaf = true;
            b.roots = p.second;
            for (int a = 0; a < 3; ++a) {
                b.lo[a] = 3.0e38f;
                b.hi[a] = -3.0e38f;
            }
            for (int r : p.second)
                for (int a = 0; a < 3; ++a) {
                    b.lo[a] = std::min(b.lo[a], c.amin[3 * r + a]);
                    b.hi[a] = std::max(b.hi[a], c.amax[3 * r + a]);
                }
            bins.push_back(std::move(b));
        }
        // splittable in roots order; expand the FIRST max-count one
        int best = -1;
        for (int r : roots)
            if (c.count[r] > c.leaf_max && (best < 0 || c.count[r] > c.count[best]))
                best = r;
        if ((int)bins.size() >= 8 || best < 0) return bins;
        roots.erase(std::find(roots.begin(), roots.end(), best));
        roots.push_back(c.left[best]);
        roots.push_back(c.right[best]);
    }
}

}  // namespace

extern "C" {

// Binary tree arrays (total nodes) -> BVH8 tables.  rows: (cap, 128) f32;
// child8/tri8: (cap, 8) i32; valid8: (cap, 8) u8.  Returns 0 on success,
// 2 if cap is too small.  out[0] = n_rows, out[1] = depth bound.
int bvh8_collapse(const float* tris, int t_count,
                  const int32_t* left, const int32_t* right,
                  const int32_t* leaf_tri, const int32_t* order,
                  const float* amin, const float* amax,
                  int total, int leaf_size, int root, int leaf_max,
                  float* rows, int32_t* child8, uint8_t* valid8, int32_t* tri8,
                  int cap, int32_t* out) {
    (void)t_count;
    if (leaf_max < 1 || leaf_max * 10 > 127) return 3;
    Ctx c{leaf_max, left, right, leaf_tri, order, amin, amax, tris, leaf_size,
          {}};
    subtree_counts(c, total);

    std::memset(rows, 0, (size_t)cap * NF * sizeof(float));
    std::memset(valid8, 0, (size_t)cap * 8);
    for (int i = 0; i < cap * 8; ++i) child8[i] = -1;
    for (int i = 0; i < cap * leaf_max; ++i) tri8[i] = -1;

    struct Pending {
        Bin bin;
        int row;
        int depth;
    };
    int next_row = 1;
    int max_depth = 1;
    std::vector<Pending> pending;
    {
        Bin b;
        if (c.count[root] <= leaf_max) {
            b.leaf = true;
            b.roots = {root};
        } else {
            b.leaf = false;
            b.node = root;
        }
        pending.push_back({std::move(b), 0, 1});
    }
    while (!pending.empty()) {
        Pending p = std::move(pending.back());
        pending.pop_back();
        if (p.row >= cap) return 2;
        max_depth = std::max(max_depth, p.depth);
        float* row = rows + (size_t)p.row * NF;
        if (p.bin.leaf) {
            std::vector<int> ids;
            for (int r : p.bin.roots) collect_tris(c, r, ids);
            row[127] = 1.0f;
            for (size_t s = 0; s < ids.size() && (int)s < leaf_max; ++s) {
                int t = ids[s];
                tri8[p.row * leaf_max + s] = t;
                for (int corner = 0; corner < 3; ++corner)
                    for (int axis = 0; axis < 3; ++axis)
                        row[(corner * 3 + axis) * leaf_max + s] =
                            c.tris[t * 9 + corner * 3 + axis];
                row[9 * leaf_max + s] = (float)t;
            }
            for (size_t s = ids.size(); (int)s < leaf_max; ++s)
                row[9 * leaf_max + s] = -1.0f;
            continue;
        }
        int bnode = p.bin.node;
        std::vector<Bin> bins = make_bins(c, bnode);
        float center[3];
        for (int a = 0; a < 3; ++a)
            center[a] = 0.5f * (amin[3 * bnode + a] + amax[3 * bnode + a]);
        // slot by centroid octant with linear probing
        int slot_of[8];
        Bin* bin_at[8] = {nullptr};
        for (size_t bi = 0; bi < bins.size(); ++bi) {
            Bin& cb = bins[bi];
            float cc[3];
            for (int a = 0; a < 3; ++a) cc[a] = 0.5f * (cb.lo[a] + cb.hi[a]);
            int want = (cc[0] >= center[0] ? 4 : 0) |
                       (cc[1] >= center[1] ? 2 : 0) | (cc[2] >= center[2] ? 1 : 0);
            int slot = want;
            for (int probe = 0; probe < 8; ++probe) {
                slot = (want + probe) % 8;
                if (!bin_at[slot]) break;
            }
            bin_at[slot] = &cb;
            slot_of[bi] = slot;
        }
        (void)slot_of;
        // compact child allocation in slot order; empty slots: inverted boxes
        for (int i = 0; i < 24; ++i) row[i] = 3.0e38f;
        for (int i = 24; i < 48; ++i) row[i] = -3.0e38f;
        int base = next_row;
        int32_t offmap = 0;
        for (int slot = 0; slot < 8; ++slot) {
            if (!bin_at[slot]) continue;
            int child_row = next_row++;
            child8[p.row * 8 + slot] = child_row;
            valid8[p.row * 8 + slot] = 1;
            offmap |= (child_row - base) << (3 * slot);
            for (int axis = 0; axis < 3; ++axis) {
                row[axis * 8 + slot] = bin_at[slot]->lo[axis];
                row[(3 + axis) * 8 + slot] = bin_at[slot]->hi[axis];
            }
            pending.push_back({std::move(*bin_at[slot]), child_row, p.depth + 1});
        }
        row[48] = (float)base;
        row[49] = (float)offmap;
    }
    out[0] = next_row;
    out[1] = max_depth + 2;
    return 0;
}

}  // extern "C"
