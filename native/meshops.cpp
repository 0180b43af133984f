// tsdfjax native mesh ops: vertex welding, normals, fast OBJ serialization.
//
// TPU-native counterpart of the reference's C++ mesh utility layer
// (ml::MeshData / ml::MeshIO, ~2.4k LoC of mLib-derived code): the hot
// host-side paths — spatial-hash vertex welding (meshData.cpp:198-260),
// area-weighted vertex normals (meshData.h:713-736), and OBJ text
// serialization (MeshIO.cpp) — implemented against a plain C ABI so the
// Python layer binds via ctypes (no pybind11 in this image). Python
// keeps a NumPy fallback; this library is selected when present
// (tsdfjax/native.py builds it on demand with g++).
//
// Build: g++ -O3 -fPIC -shared -std=c++17 meshops.cpp -o libtsdfmeshops.so

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <unordered_map>
#include <vector>

namespace {

struct Key3 {
    int64_t x, y, z;
    bool operator==(const Key3& o) const { return x == o.x && y == o.y && z == o.z; }
};

struct Key3Hash {
    size_t operator()(const Key3& k) const {
        // the reference's sparseGrid3 prime hash (sparseGrid3.h:6-16)
        const uint64_t p0 = 73856093ull, p1 = 19349669ull, p2 = 83492791ull;
        return (size_t)(((uint64_t)k.x * p0) ^ ((uint64_t)k.y * p1) ^ ((uint64_t)k.z * p2));
    }
};

struct FaceKey {
    int64_t a, b, c;  // sorted
    bool operator==(const FaceKey& o) const { return a == o.a && b == o.b && c == o.c; }
};
struct FaceKeyHash {
    size_t operator()(const FaceKey& f) const {
        uint64_t h = 1469598103934665603ull;
        for (int64_t v : {f.a, f.b, f.c}) {
            h ^= (uint64_t)v;
            h *= 1099511628211ull;
        }
        return (size_t)h;
    }
};

}  // namespace

extern "C" {

// Weld a triangle soup on a quantized grid; drops degenerate and
// duplicate faces. Buffers out_verts/out_colors must hold ntri*3*3
// floats, out_faces ntri*3 int64. Returns 0 on success; writes the
// final vertex / face counts.
int tj_weld(const float* tri_verts, const float* tri_colors, int64_t ntri,
            float eps, float* out_verts, float* out_colors,
            int64_t* out_faces, int64_t* out_nv, int64_t* out_nf) {
    if (ntri < 0 || eps <= 0) return 1;
    std::unordered_map<Key3, int64_t, Key3Hash> grid;
    grid.reserve((size_t)(ntri * 2));
    std::unordered_map<FaceKey, char, FaceKeyHash> seen_faces;
    seen_faces.reserve((size_t)ntri);

    int64_t nv = 0, nf = 0;
    const float inv_eps = 1.0f / eps;
    int64_t idx[3];
    for (int64_t t = 0; t < ntri; ++t) {
        for (int c = 0; c < 3; ++c) {
            const float* p = tri_verts + (t * 3 + c) * 3;
            Key3 k{(int64_t)llroundf(p[0] * inv_eps),
                   (int64_t)llroundf(p[1] * inv_eps),
                   (int64_t)llroundf(p[2] * inv_eps)};
            auto it = grid.find(k);
            if (it == grid.end()) {
                it = grid.emplace(k, nv).first;
                std::memcpy(out_verts + nv * 3, p, 3 * sizeof(float));
                if (tri_colors && out_colors)
                    std::memcpy(out_colors + nv * 3, tri_colors + (t * 3 + c) * 3,
                                3 * sizeof(float));
                ++nv;
            }
            idx[c] = it->second;
        }
        if (idx[0] == idx[1] || idx[1] == idx[2] || idx[0] == idx[2]) continue;
        FaceKey fk{idx[0], idx[1], idx[2]};
        if (fk.a > fk.b) std::swap(fk.a, fk.b);
        if (fk.b > fk.c) std::swap(fk.b, fk.c);
        if (fk.a > fk.b) std::swap(fk.a, fk.b);
        if (!seen_faces.emplace(fk, 1).second) continue;
        out_faces[nf * 3 + 0] = idx[0];
        out_faces[nf * 3 + 1] = idx[1];
        out_faces[nf * 3 + 2] = idx[2];
        ++nf;
    }
    *out_nv = nv;
    *out_nf = nf;
    return 0;
}

// Area-weighted vertex normals (accumulate unnormalized face cross
// products, normalize at the end) — meshData.h:713-736 semantics.
int tj_vertex_normals(const float* verts, int64_t nv, const int64_t* faces,
                      int64_t nf, float* out_normals) {
    std::memset(out_normals, 0, (size_t)nv * 3 * sizeof(float));
    for (int64_t f = 0; f < nf; ++f) {
        const int64_t a = faces[f * 3], b = faces[f * 3 + 1], c = faces[f * 3 + 2];
        if (a < 0 || a >= nv || b < 0 || b >= nv || c < 0 || c >= nv) return 1;
        const float* pa = verts + a * 3;
        const float* pb = verts + b * 3;
        const float* pc = verts + c * 3;
        float e1[3] = {pb[0] - pa[0], pb[1] - pa[1], pb[2] - pa[2]};
        float e2[3] = {pc[0] - pa[0], pc[1] - pa[1], pc[2] - pa[2]};
        float n[3] = {e1[1] * e2[2] - e1[2] * e2[1],
                      e1[2] * e2[0] - e1[0] * e2[2],
                      e1[0] * e2[1] - e1[1] * e2[0]};
        for (int64_t v : {a, b, c})
            for (int d = 0; d < 3; ++d) out_normals[v * 3 + d] += n[d];
    }
    for (int64_t v = 0; v < nv; ++v) {
        float* n = out_normals + v * 3;
        float len = std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
        if (len > 1e-30f)
            for (int d = 0; d < 3; ++d) n[d] /= len;
    }
    return 0;
}

// Buffered OBJ writer (colors as vertex-color extension, normals as vn,
// faces 1-based v//vn like MeshIO's writer). Returns 0 on success.
int tj_write_obj(const char* path, const float* verts, const float* colors,
                 const float* normals, int64_t nv, const int64_t* faces,
                 int64_t nf) {
    FILE* f = std::fopen(path, "w");
    if (!f) return 1;
    setvbuf(f, nullptr, _IOFBF, 1 << 20);
    std::fputs("# tsdfjax mesh (native writer)\n", f);
    char buf[256];
    for (int64_t i = 0; i < nv; ++i) {
        const float* p = verts + i * 3;
        int n;
        if (colors) {
            const float* c = colors + i * 3;
            n = snprintf(buf, sizeof buf, "v %.6f %.6f %.6f %.4f %.4f %.4f\n",
                         p[0], p[1], p[2], c[0] / 255.0f, c[1] / 255.0f,
                         c[2] / 255.0f);
        } else {
            n = snprintf(buf, sizeof buf, "v %.6f %.6f %.6f\n", p[0], p[1], p[2]);
        }
        std::fwrite(buf, 1, (size_t)n, f);
    }
    if (normals) {
        for (int64_t i = 0; i < nv; ++i) {
            const float* p = normals + i * 3;
            int n = snprintf(buf, sizeof buf, "vn %.6f %.6f %.6f\n", p[0], p[1], p[2]);
            std::fwrite(buf, 1, (size_t)n, f);
        }
    }
    for (int64_t i = 0; i < nf; ++i) {
        const int64_t a = faces[i * 3] + 1, b = faces[i * 3 + 1] + 1,
                      c = faces[i * 3 + 2] + 1;
        int n = normals
                    ? snprintf(buf, sizeof buf,
                               "f %lld//%lld %lld//%lld %lld//%lld\n",
                               (long long)a, (long long)a, (long long)b,
                               (long long)b, (long long)c, (long long)c)
                    : snprintf(buf, sizeof buf, "f %lld %lld %lld\n",
                               (long long)a, (long long)b, (long long)c);
        std::fwrite(buf, 1, (size_t)n, f);
    }
    return std::fclose(f) == 0 ? 0 : 1;
}

}  // extern "C"
