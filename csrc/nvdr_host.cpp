// nvdiffrast_tpu native host runtime.
//
// Host-side mesh preprocessing with a plain C ABI (loaded via ctypes).
// These are the CPU counterparts of work the reference does in CUDA on
// device: topology analysis for antialiasing (the edge-vertex hash,
// csrc/common/antialias.cu:111-160 in the reference) and geometry
// utilities. Results are bit-identical to the JAX implementations in
// nvdiffrast_tpu/ops/topology.py so either path can be used.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <string>
#include <vector>

extern "C" {

// Opposite-vertex table: for triangle t and local edge e
// (e=0: {v1,v2} opp v0; e=1: {v2,v0} opp v1; e=2: {v0,v1} opp v2),
// out[t*3+e] = the opposing vertex of the other triangle sharing that
// edge, or -1. Matches ops/topology.py: per canonical edge, the first
// two *distinct* opposing vertices (in ascending order) are kept.
void nvdr_build_opposite_table(const int32_t* tri, int64_t n_tri,
                               int32_t num_vertices, int32_t* out) {
    struct Slot {
        int32_t kmin, kmax, vn;
        int64_t slot;
    };
    std::vector<Slot> slots;
    slots.reserve(static_cast<size_t>(n_tri) * 3);

    for (int64_t t = 0; t < n_tri; t++) {
        int32_t v0 = tri[t * 3 + 0];
        int32_t v1 = tri[t * 3 + 1];
        int32_t v2 = tri[t * 3 + 2];
        out[t * 3 + 0] = -1;
        out[t * 3 + 1] = -1;
        out[t * 3 + 2] = -1;
        bool ok = v0 != v1 && v1 != v2 && v2 != v0 &&
                  v0 >= 0 && v1 >= 0 && v2 >= 0;
        if (num_vertices >= 0)
            ok = ok && v0 < num_vertices && v1 < num_vertices && v2 < num_vertices;
        if (!ok) continue;
        const int32_t ea[3] = {v1, v2, v0};
        const int32_t eb[3] = {v2, v0, v1};
        const int32_t vn[3] = {v0, v1, v2};
        for (int e = 0; e < 3; e++) {
            Slot s;
            s.kmin = std::min(ea[e], eb[e]);
            s.kmax = std::max(ea[e], eb[e]);
            s.vn = vn[e];
            s.slot = t * 3 + e;
            slots.push_back(s);
        }
    }

    std::sort(slots.begin(), slots.end(), [](const Slot& a, const Slot& b) {
        if (a.kmin != b.kmin) return a.kmin < b.kmin;
        if (a.kmax != b.kmax) return a.kmax < b.kmax;
        if (a.vn != b.vn) return a.vn < b.vn;
        return a.slot < b.slot;
    });

    size_t i = 0;
    while (i < slots.size()) {
        size_t j = i;
        while (j < slots.size() && slots[j].kmin == slots[i].kmin &&
               slots[j].kmax == slots[i].kmax)
            j++;
        // First two distinct opposing vertices in the group.
        int32_t p0 = slots[i].vn;
        int32_t p1 = -1;
        for (size_t k = i; k < j; k++) {
            if (slots[k].vn != p0) { p1 = slots[k].vn; break; }
        }
        for (size_t k = i; k < j; k++) {
            int32_t vn = slots[k].vn;
            int32_t op = (vn == p0) ? p1 : (vn == p1 ? p0 : -1);
            out[slots[k].slot] = op;
        }
        i = j;
    }
}

// Area-weighted vertex normals.
void nvdr_vertex_normals(const int32_t* tri, int64_t n_tri,
                         const float* pos, int64_t n_vtx, float* out) {
    std::memset(out, 0, sizeof(float) * static_cast<size_t>(n_vtx) * 3);
    for (int64_t t = 0; t < n_tri; t++) {
        int32_t a = tri[t * 3 + 0], b = tri[t * 3 + 1], c = tri[t * 3 + 2];
        if (a < 0 || b < 0 || c < 0 || a >= n_vtx || b >= n_vtx || c >= n_vtx)
            continue;
        const float* pa = pos + a * 3;
        const float* pb = pos + b * 3;
        const float* pc = pos + c * 3;
        float e1[3] = {pb[0] - pa[0], pb[1] - pa[1], pb[2] - pa[2]};
        float e2[3] = {pc[0] - pa[0], pc[1] - pa[1], pc[2] - pa[2]};
        float n[3] = {e1[1] * e2[2] - e1[2] * e2[1],
                      e1[2] * e2[0] - e1[0] * e2[2],
                      e1[0] * e2[1] - e1[1] * e2[0]};
        for (int32_t v : {a, b, c})
            for (int k = 0; k < 3; k++) out[v * 3 + k] += n[k];
    }
    for (int64_t v = 0; v < n_vtx; v++) {
        float* n = out + v * 3;
        float len = std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
        if (len > 1e-20f)
            for (int k = 0; k < 3; k++) n[k] /= len;
    }
}

// --- Wavefront OBJ loading (v / vt / f triangles, fan-triangulated) ---

struct ObjData {
    std::vector<float> pos;       // [V, 3]
    std::vector<float> uv;        // [VT, 2]
    std::vector<int32_t> tri;     // [T, 3] position indices
    std::vector<int32_t> uv_tri;  // [T, 3] uv indices (or -1)
};

static bool parse_obj(const char* path, ObjData& d) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    char line[4096];
    while (std::fgets(line, sizeof(line), f)) {
        if (line[0] == 'v' && line[1] == ' ') {
            float x, y, z;
            if (std::sscanf(line + 2, "%f %f %f", &x, &y, &z) == 3) {
                d.pos.push_back(x);
                d.pos.push_back(y);
                d.pos.push_back(z);
            }
        } else if (line[0] == 'v' && line[1] == 't' && line[2] == ' ') {
            float u, v;
            if (std::sscanf(line + 3, "%f %f", &u, &v) == 2) {
                d.uv.push_back(u);
                d.uv.push_back(v);
            }
        } else if (line[0] == 'f' && line[1] == ' ') {
            // Parse up to 8 corners: v, v/t, v/t/n, v//n.
            int32_t vi[8], ti[8];
            int n = 0;
            char* p = line + 2;
            while (*p && n < 8) {
                while (*p == ' ' || *p == '\t') p++;
                if (*p == '\0' || *p == '\n' || *p == '\r') break;
                long v = std::strtol(p, &p, 10);
                long t = 0;
                if (*p == '/') {
                    p++;
                    if (*p != '/') t = std::strtol(p, &p, 10);
                    if (*p == '/') { p++; std::strtol(p, &p, 10); }
                }
                int64_t nv = static_cast<int64_t>(d.pos.size() / 3);
                int64_t nt = static_cast<int64_t>(d.uv.size() / 2);
                vi[n] = static_cast<int32_t>(v > 0 ? v - 1 : nv + v);
                ti[n] = t != 0 ? static_cast<int32_t>(t > 0 ? t - 1 : nt + t)
                               : -1;
                n++;
            }
            for (int k = 2; k < n; k++) {  // fan triangulation
                d.tri.push_back(vi[0]);
                d.tri.push_back(vi[k - 1]);
                d.tri.push_back(vi[k]);
                d.uv_tri.push_back(ti[0]);
                d.uv_tri.push_back(ti[k - 1]);
                d.uv_tri.push_back(ti[k]);
            }
        }
    }
    std::fclose(f);
    return true;
}

// Two-pass API: counts first, then fill preallocated buffers.
int nvdr_load_obj_counts(const char* path, int64_t* n_vtx, int64_t* n_tri,
                         int64_t* n_uv) {
    ObjData d;
    if (!parse_obj(path, d)) return -1;
    *n_vtx = static_cast<int64_t>(d.pos.size() / 3);
    *n_tri = static_cast<int64_t>(d.tri.size() / 3);
    *n_uv = static_cast<int64_t>(d.uv.size() / 2);
    return 0;
}

int nvdr_load_obj(const char* path, float* pos, int32_t* tri, float* uv,
                  int32_t* uv_tri) {
    ObjData d;
    if (!parse_obj(path, d)) return -1;
    std::memcpy(pos, d.pos.data(), d.pos.size() * sizeof(float));
    std::memcpy(tri, d.tri.data(), d.tri.size() * sizeof(int32_t));
    if (!d.uv.empty())
        std::memcpy(uv, d.uv.data(), d.uv.size() * sizeof(float));
    std::memcpy(uv_tri, d.uv_tri.data(), d.uv_tri.size() * sizeof(int32_t));
    return 0;
}

}  // extern "C"
