// evosoro_tpu native runtime — host-side C++ components.
//
// TPU-native re-design of the reference's host-side C++ utilities:
//  * VXA structure-layer codec (reference: VX_Object.cpp:1748-1830 — the
//    <Data><Layer> CDATA encodings ASCII_READABLE(+48)/BASE64/ZLIB).
//  * Convex-hull volume/area via 3D quickhull (reference invokes an external
//    prebuilt `qhull FS TI` binary through popen: VX_MeshUtil.cpp:775-899;
//    here it is an in-process implementation, no subprocess, no temp files).
//  * Deformed-surface-mesh robot volume by the divergence theorem and
//    vertex angle-excess shape complexity (reference: VX_MeshUtil.cpp:902-948
//    computeCurrentRobotVolume, :949-1093 computeShapeComplexity).
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment). All
// buffers are caller-allocated; functions return 0 on success.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <cstdlib>
#include <vector>
#include <array>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// Layer codec
// ---------------------------------------------------------------------------

// ASCII_READABLE: each voxel's material id stored as char(id + '0') — the
// evosoro Python writer emits str(id) digits (read_write_voxelyze.py:374-385);
// the C++ engine's generic path uses +48 offset, identical for ids 0-9.
int decode_ascii_layer(const char* text, int64_t n, uint8_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        char c = text[i];
        if (c < '0') return -1;
        out[i] = (uint8_t)(c - '0');
    }
    return 0;
}

int encode_ascii_layer(const uint8_t* ids, int64_t n, char* out) {
    for (int64_t i = 0; i < n; ++i) out[i] = (char)('0' + ids[i]);
    return 0;
}

static const char B64TAB[] =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";

int encode_base64(const uint8_t* in, int64_t n, char* out, int64_t* out_len) {
    int64_t o = 0;
    for (int64_t i = 0; i < n; i += 3) {
        uint32_t v = (uint32_t)in[i] << 16;
        if (i + 1 < n) v |= (uint32_t)in[i + 1] << 8;
        if (i + 2 < n) v |= (uint32_t)in[i + 2];
        out[o++] = B64TAB[(v >> 18) & 63];
        out[o++] = B64TAB[(v >> 12) & 63];
        out[o++] = (i + 1 < n) ? B64TAB[(v >> 6) & 63] : '=';
        out[o++] = (i + 2 < n) ? B64TAB[v & 63] : '=';
    }
    *out_len = o;
    return 0;
}

int decode_base64(const char* in, int64_t n, uint8_t* out, int64_t* out_len) {
    static int8_t rev[256];
    static bool init = false;
    if (!init) {
        memset(rev, -1, sizeof(rev));
        for (int i = 0; i < 64; ++i) rev[(uint8_t)B64TAB[i]] = (int8_t)i;
        init = true;
    }
    int64_t o = 0;
    uint32_t acc = 0;
    int bits = 0;
    for (int64_t i = 0; i < n; ++i) {
        char c = in[i];
        if (c == '=' || c == '\n' || c == '\r' || c == ' ') continue;
        int8_t d = rev[(uint8_t)c];
        if (d < 0) return -1;
        acc = (acc << 6) | (uint32_t)d;
        bits += 6;
        if (bits >= 8) {
            bits -= 8;
            out[o++] = (uint8_t)((acc >> bits) & 0xFF);
        }
    }
    *out_len = o;
    return 0;
}

// ---------------------------------------------------------------------------
// Quickhull (3D) — replaces the reference's popen("qhull FS TI ...") call.
// Returns hull volume and surface area. Robust enough for voxel-robot point
// clouds (hundreds to thousands of points); degenerate (flat/collinear)
// inputs return volume 0.
// ---------------------------------------------------------------------------

namespace {

struct V3 {
    double x, y, z;
    V3 operator-(const V3& o) const { return {x - o.x, y - o.y, z - o.z}; }
    V3 operator+(const V3& o) const { return {x + o.x, y + o.y, z + o.z}; }
    V3 operator*(double s) const { return {x * s, y * s, z * s}; }
};
static inline V3 cross(const V3& a, const V3& b) {
    return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
static inline double dot(const V3& a, const V3& b) {
    return a.x * b.x + a.y * b.y + a.z * b.z;
}
static inline double norm(const V3& a) { return std::sqrt(dot(a, a)); }

struct Face {
    int a, b, c;     // vertex indices (CCW from outside)
    V3 n;            // unit-ish normal
    double d;        // plane offset: dot(n, p) = d
    bool alive;
    std::vector<int> outside;  // candidate points above this face
};

struct Hull {
    const V3* pts;
    int n;
    std::vector<Face> faces;
    double eps;

    void make_face(int a, int b, int c, const V3& interior) {
        Face f;
        f.a = a; f.b = b; f.c = c;
        f.n = cross(pts[b] - pts[a], pts[c] - pts[a]);
        double l = norm(f.n);
        if (l > 0) f.n = f.n * (1.0 / l);
        f.d = dot(f.n, pts[a]);
        if (dot(f.n, interior) - f.d > 0) {  // flip to face outward
            std::swap(f.b, f.c);
            f.n = f.n * -1.0;
            f.d = -f.d;
        }
        f.alive = true;
        faces.push_back(std::move(f));
    }
};

}  // namespace

// points: n x 3 doubles. Outputs hull volume & area. Returns 0 on success,
// 1 if degenerate (volume set to 0).
int convex_hull_volume(const double* points, int64_t n, double* volume,
                       double* area) {
    *volume = 0.0;
    *area = 0.0;
    if (n < 4) return 1;
    std::vector<V3> P((size_t)n);
    for (int64_t i = 0; i < n; ++i)
        P[(size_t)i] = {points[3 * i], points[3 * i + 1], points[3 * i + 2]};

    // scale-aware epsilon
    double span = 0;
    for (auto& p : P) span = std::max({span, std::fabs(p.x), std::fabs(p.y), std::fabs(p.z)});
    double eps = 1e-12 * std::max(span, 1.0) * 3.0 + 1e-300;

    // initial tetrahedron: extreme points
    int i0 = 0, i1 = 0;
    for (int i = 1; i < (int)n; ++i) {
        if (P[i].x < P[i0].x) i0 = i;
        if (P[i].x > P[i1].x) i1 = i;
    }
    if (i0 == i1) return 1;
    int i2 = -1;
    double best = eps;
    V3 e01 = P[i1] - P[i0];
    for (int i = 0; i < (int)n; ++i) {
        double d = norm(cross(e01, P[i] - P[i0]));
        if (d > best) { best = d; i2 = i; }
    }
    if (i2 < 0) return 1;
    int i3 = -1;
    best = eps;
    V3 nrm = cross(e01, P[i2] - P[i0]);
    for (int i = 0; i < (int)n; ++i) {
        double d = std::fabs(dot(nrm, P[i] - P[i0]));
        if (d > best) { best = d; i3 = i; }
    }
    if (i3 < 0) return 1;

    V3 interior = (P[i0] + P[i1] + P[i2] + P[i3]) * 0.25;
    Hull H;
    H.pts = P.data();
    H.n = (int)n;
    H.eps = eps;
    H.make_face(i0, i1, i2, interior);
    H.make_face(i0, i1, i3, interior);
    H.make_face(i0, i2, i3, interior);
    H.make_face(i1, i2, i3, interior);

    // assign outside sets
    for (int i = 0; i < (int)n; ++i) {
        for (auto& f : H.faces) {
            if (dot(f.n, P[i]) - f.d > eps) { f.outside.push_back(i); break; }
        }
    }

    // iterate: expand to farthest outside point
    for (size_t fi = 0; fi < H.faces.size(); ++fi) {
        if (!H.faces[fi].alive || H.faces[fi].outside.empty()) continue;
        // farthest point
        int far = -1;
        double fd = -1;
        for (int p : H.faces[fi].outside) {
            double d = dot(H.faces[fi].n, P[p]) - H.faces[fi].d;
            if (d > fd) { fd = d; far = p; }
        }
        if (far < 0) continue;
        // find visible faces (flood over all faces for simplicity)
        std::vector<int> visible;
        for (size_t j = 0; j < H.faces.size(); ++j) {
            if (!H.faces[j].alive) continue;
            if (dot(H.faces[j].n, P[far]) - H.faces[j].d > eps)
                visible.push_back((int)j);
        }
        // horizon edges: edges of visible faces shared with non-visible
        std::vector<std::pair<int, int>> edges;
        std::vector<int> orphan;
        for (int j : visible) {
            Face& f = H.faces[j];
            int vs[3][2] = {{f.a, f.b}, {f.b, f.c}, {f.c, f.a}};
            for (auto& e : vs) edges.push_back({e[0], e[1]});
            f.alive = false;
            for (int p : f.outside) if (p != far) orphan.push_back(p);
            f.outside.clear();
        }
        // keep edges that appear once (cancel opposite-direction duplicates)
        std::vector<std::pair<int, int>> horizon;
        for (auto& e : edges) {
            bool dup = false;
            for (auto& o : edges)
                if (o.first == e.second && o.second == e.first) { dup = true; break; }
            if (!dup) horizon.push_back(e);
        }
        size_t first_new = H.faces.size();
        for (auto& e : horizon) H.make_face(e.first, e.second, far, interior);
        // reassign orphans
        for (int p : orphan) {
            for (size_t j = first_new; j < H.faces.size(); ++j) {
                Face& f = H.faces[j];
                if (f.alive && dot(f.n, P[p]) - f.d > eps) {
                    f.outside.push_back(p);
                    break;
                }
            }
        }
    }

    // volume (divergence theorem over hull facets) + area
    double vol = 0, ar = 0;
    for (auto& f : H.faces) {
        if (!f.alive) continue;
        const V3 &a = P[f.a], &b = P[f.b], &c = P[f.c];
        vol += dot(a, cross(b - a, c - a)) / 6.0;
        // note: dot(a, cross(b,c))/6 signed tet volume; using origin form:
        ar += 0.5 * norm(cross(b - a, c - a));
    }
    // origin-based signed tet volume (orientation outward → positive)
    double vol2 = 0;
    for (auto& f : H.faces) {
        if (!f.alive) continue;
        const V3 &a = P[f.a], &b = P[f.b], &c = P[f.c];
        vol2 += dot(a, cross(b, c)) / 6.0;
    }
    *volume = std::fabs(vol2);
    *area = ar;
    return 0;
}

// ---------------------------------------------------------------------------
// Deformed-mesh utilities over the voxel surface mesh.
// Surface extraction mirrors the reference's initializeDeformableMesh: every
// exposed voxel face contributes 2 triangles whose vertices are voxel corner
// points (pos ± scale/2 along the face), welded across voxels by lattice
// corner identity (VX_MeshUtil.cpp:40-250 up to smoothing).
// ---------------------------------------------------------------------------

// occupancy: X*Y*Z uint8 (C order). Emits triangle corner-lattice indices.
// Corner lattice is (X+1)*(Y+1)*(Z+1). Caller provides out buffers sized
// max_tris*3; returns number of triangles (or -1 if overflow).
int64_t surface_triangles(const uint8_t* occ, int64_t X, int64_t Y, int64_t Z,
                          int32_t* tri_corners, int64_t max_tris) {
    auto at = [&](int64_t x, int64_t y, int64_t z) -> uint8_t {
        if (x < 0 || y < 0 || z < 0 || x >= X || y >= Y || z >= Z) return 0;
        return occ[(x * Y + y) * Z + z];
    };
    auto corner = [&](int64_t x, int64_t y, int64_t z) -> int32_t {
        return (int32_t)((x * (Y + 1) + y) * (Z + 1) + z);
    };
    int64_t ntri = 0;
    // face corner offsets per direction/sign, wound CCW outward
    for (int64_t x = 0; x < X; ++x)
        for (int64_t y = 0; y < Y; ++y)
            for (int64_t z = 0; z < Z; ++z) {
                if (!at(x, y, z)) continue;
                struct FaceDef { int dx, dy, dz; int c[4][3]; };
                static const FaceDef F[6] = {
                    // +X: quad (1,0,0)(1,1,0)(1,1,1)(1,0,1)
                    {+1, 0, 0, {{1,0,0},{1,1,0},{1,1,1},{1,0,1}}},
                    // -X
                    {-1, 0, 0, {{0,0,0},{0,0,1},{0,1,1},{0,1,0}}},
                    // +Y
                    {0, +1, 0, {{0,1,0},{0,1,1},{1,1,1},{1,1,0}}},
                    // -Y
                    {0, -1, 0, {{0,0,0},{1,0,0},{1,0,1},{0,0,1}}},
                    // +Z
                    {0, 0, +1, {{0,0,1},{1,0,1},{1,1,1},{0,1,1}}},
                    // -Z
                    {0, 0, -1, {{0,0,0},{0,1,0},{1,1,0},{1,0,0}}},
                };
                for (auto& f : F) {
                    if (at(x + f.dx, y + f.dy, z + f.dz)) continue;
                    if (ntri + 2 > max_tris) return -1;
                    int32_t q[4];
                    for (int k = 0; k < 4; ++k)
                        q[k] = corner(x + f.c[k][0], y + f.c[k][1], z + f.c[k][2]);
                    tri_corners[3 * ntri + 0] = q[0];
                    tri_corners[3 * ntri + 1] = q[1];
                    tri_corners[3 * ntri + 2] = q[2];
                    ++ntri;
                    tri_corners[3 * ntri + 0] = q[0];
                    tri_corners[3 * ntri + 1] = q[2];
                    tri_corners[3 * ntri + 2] = q[3];
                    ++ntri;
                }
            }
    return ntri;
}

// Volume of a closed triangle mesh by the divergence theorem
// (reference: VX_MeshUtil.cpp:902-948). verts: V x 3, tris: T x 3 indices.
int mesh_volume(const double* verts, int64_t nv, const int32_t* tris,
                int64_t nt, double* volume) {
    (void)nv;
    double vol = 0;
    for (int64_t t = 0; t < nt; ++t) {
        const double* a = verts + 3 * tris[3 * t];
        const double* b = verts + 3 * tris[3 * t + 1];
        const double* c = verts + 3 * tris[3 * t + 2];
        vol += (a[0] * (b[1] * c[2] - b[2] * c[1]) -
                a[1] * (b[0] * c[2] - b[2] * c[0]) +
                a[2] * (b[0] * c[1] - b[1] * c[0])) / 6.0;
    }
    *volume = std::fabs(vol);
    return 0;
}

// Shape complexity: vertex angle-excess curvature statistic
// (reference: VX_MeshUtil.cpp:949-1093 computeShapeComplexity — sum over
// vertices of |2π − Σ incident triangle angles|).
int shape_complexity(const double* verts, int64_t nv, const int32_t* tris,
                     int64_t nt, double* complexity) {
    std::vector<double> angle_sum((size_t)nv, 0.0);
    std::vector<uint8_t> used((size_t)nv, 0);
    for (int64_t t = 0; t < nt; ++t) {
        int32_t ia = tris[3 * t], ib = tris[3 * t + 1], ic = tris[3 * t + 2];
        V3 a{verts[3 * ia], verts[3 * ia + 1], verts[3 * ia + 2]};
        V3 b{verts[3 * ib], verts[3 * ib + 1], verts[3 * ib + 2]};
        V3 c{verts[3 * ic], verts[3 * ic + 1], verts[3 * ic + 2]};
        auto ang = [](const V3& u, const V3& v) {
            double cu = dot(u, v) / (norm(u) * norm(v) + 1e-300);
            cu = std::max(-1.0, std::min(1.0, cu));
            return std::acos(cu);
        };
        angle_sum[(size_t)ia] += ang(b - a, c - a);
        angle_sum[(size_t)ib] += ang(a - b, c - b);
        angle_sum[(size_t)ic] += ang(a - c, b - c);
        used[(size_t)ia] = used[(size_t)ib] = used[(size_t)ic] = 1;
    }
    double total = 0;
    for (int64_t v = 0; v < nv; ++v)
        if (used[(size_t)v]) total += std::fabs(2.0 * M_PI - angle_sum[(size_t)v]);
    *complexity = total;
    return 0;
}

}  // extern "C"
