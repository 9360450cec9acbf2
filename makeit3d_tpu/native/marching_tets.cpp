// Isosurface extraction via marching tetrahedra.
//
// Native replacement for the PyMCubes dependency the reference uses at
// mesh export (reference: nerf/renderer.py:182, nerf/utils.py:187).
// Each grid cube splits into 6 tetrahedra around the main diagonal; per
// tet the iso-crossings of its 6 edges triangulate directly, so no
// 256-case lookup tables are needed and every case is orientation-
// checked analytically (normals point from the >iso region outward).
//
// Vertices are deduplicated by canonical grid-edge id so the mesh is
// watertight across cube boundaries.
//
// Build: g++ -O3 -march=native -shared -fPIC marching_tets.cpp -o libmtets.so

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <tuple>
#include <unordered_map>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};

static inline V3 sub(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline V3 cross(V3 a, V3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
          a.x * b.y - a.y * b.x};
}
static inline float dot(V3 a, V3 b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}

// cube corner offsets (x, y, z)
static const int kCorner[8][3] = {{0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
                                  {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1}};

// six tetrahedra sharing the 0-6 diagonal
static const int kTets[6][4] = {{0, 5, 1, 6}, {0, 1, 2, 6}, {0, 2, 3, 6},
                                {0, 3, 7, 6}, {0, 7, 4, 6}, {0, 4, 5, 6}};

struct MeshBuilder {
  std::vector<float> verts;
  std::vector<int64_t> tris;
  std::unordered_map<uint64_t, int64_t> edge_to_vertex;

  // canonical id of the grid edge between two corner lattice points
  static uint64_t EdgeKey(int64_t ax, int64_t ay, int64_t az, int64_t bx,
                          int64_t by, int64_t bz) {
    // order endpoints lexicographically
    if (std::tie(ax, ay, az) > std::tie(bx, by, bz)) {
      std::swap(ax, bx);
      std::swap(ay, by);
      std::swap(az, bz);
    }
    // pack: endpoint a (11 bits per axis; grids beyond 2047^3 would
// collide in the dedup key) + direction code (2 bits/axis)
    uint64_t key = 0;
    key = (key << 11) | uint64_t(ax);
    key = (key << 11) | uint64_t(ay);
    key = (key << 11) | uint64_t(az);
    key = (key << 2) | uint64_t(bx - ax + 1);
    key = (key << 2) | uint64_t(by - ay + 1);
    key = (key << 2) | uint64_t(bz - az + 1);
    return key;
  }

  int64_t EdgeVertex(const int a[3], const int b[3], float va, float vb,
                     float iso, int cx, int cy, int cz) {
    int64_t ax = cx + a[0], ay = cy + a[1], az = cz + a[2];
    int64_t bx = cx + b[0], by = cy + b[1], bz = cz + b[2];
    uint64_t key = EdgeKey(ax, ay, az, bx, by, bz);
    auto it = edge_to_vertex.find(key);
    if (it != edge_to_vertex.end()) return it->second;
    float t = (iso - va) / (vb - va);
    if (t < 0.f) t = 0.f;
    if (t > 1.f) t = 1.f;
    int64_t idx = int64_t(verts.size() / 3);
    verts.push_back(float(ax) + t * float(bx - ax));
    verts.push_back(float(ay) + t * float(by - ay));
    verts.push_back(float(az) + t * float(bz - az));
    edge_to_vertex.emplace(key, idx);
    return idx;
  }

  V3 VertexPos(int64_t i) const {
    return {verts[3 * i], verts[3 * i + 1], verts[3 * i + 2]};
  }

  void EmitTri(int64_t i0, int64_t i1, int64_t i2, V3 inside_pt) {
    // orient so the normal points away from the inside (>iso) sample
    V3 p0 = VertexPos(i0), p1 = VertexPos(i1), p2 = VertexPos(i2);
    V3 n = cross(sub(p1, p0), sub(p2, p0));
    V3 c = {(p0.x + p1.x + p2.x) / 3.f, (p0.y + p1.y + p2.y) / 3.f,
            (p0.z + p1.z + p2.z) / 3.f};
    if (dot(n, sub(c, inside_pt)) < 0.f) std::swap(i1, i2);
    tris.push_back(i0);
    tris.push_back(i1);
    tris.push_back(i2);
  }
};

}  // namespace

extern "C" {

// grid: [nx, ny, nz] row-major (x outermost). Returns 0 on success.
// Single-phase API: out_verts/out_tris are malloc'd here and owned
// by the caller (freed via mtets_free); null outputs are NOT supported.
int marching_tets(const float* grid, int64_t nx, int64_t ny, int64_t nz,
                  float iso, float** out_verts, int64_t* out_nv,
                  int64_t** out_tris, int64_t* out_nt) {
  MeshBuilder mb;
  mb.verts.reserve(1 << 20);
  mb.tris.reserve(1 << 20);

  auto at = [&](int64_t x, int64_t y, int64_t z) -> float {
    return grid[(x * ny + y) * nz + z];
  };

  for (int64_t x = 0; x + 1 < nx; ++x) {
    for (int64_t y = 0; y + 1 < ny; ++y) {
      for (int64_t z = 0; z + 1 < nz; ++z) {
        float cv[8];
        bool any_in = false, any_out = false;
        for (int c = 0; c < 8; ++c) {
          cv[c] = at(x + kCorner[c][0], y + kCorner[c][1], z + kCorner[c][2]);
          (cv[c] > iso ? any_in : any_out) = true;
        }
        if (!any_in || !any_out) continue;

        for (int t = 0; t < 6; ++t) {
          const int* tet = kTets[t];
          int inside[4], n_in = 0;
          for (int k = 0; k < 4; ++k)
            if (cv[tet[k]] > iso) inside[n_in++] = k;
          if (n_in == 0 || n_in == 4) continue;

          // centroid of inside corners (for orientation)
          V3 ipt = {0, 0, 0};
          for (int k = 0; k < n_in; ++k) {
            const int* o = kCorner[tet[inside[k]]];
            ipt.x += float(x + o[0]);
            ipt.y += float(y + o[1]);
            ipt.z += float(z + o[2]);
          }
          ipt.x /= n_in;
          ipt.y /= n_in;
          ipt.z /= n_in;

          auto edge_v = [&](int ka, int kb) {
            int a = tet[ka], b = tet[kb];
            return mb.EdgeVertex(kCorner[a], kCorner[b], cv[a], cv[b], iso,
                                 int(x), int(y), int(z));
          };

          if (n_in == 1 || n_in == 3) {
            // single separated vertex (inside if n_in==1, outside if 3)
            int solo = -1;
            if (n_in == 1) {
              solo = inside[0];
            } else {
              for (int k = 0; k < 4; ++k) {
                bool is_in = false;
                for (int m = 0; m < n_in; ++m)
                  if (inside[m] == k) is_in = true;
                if (!is_in) solo = k;
              }
            }
            int others[3], no = 0;
            for (int k = 0; k < 4; ++k)
              if (k != solo) others[no++] = k;
            int64_t v0 = edge_v(solo, others[0]);
            int64_t v1 = edge_v(solo, others[1]);
            int64_t v2 = edge_v(solo, others[2]);
            mb.EmitTri(v0, v1, v2, ipt);
          } else {  // n_in == 2: quad -> two triangles
            int in0 = inside[0], in1 = inside[1];
            int outs[2], no = 0;
            for (int k = 0; k < 4; ++k)
              if (k != in0 && k != in1) outs[no++] = k;
            int64_t a = edge_v(in0, outs[0]);
            int64_t b = edge_v(in0, outs[1]);
            int64_t c = edge_v(in1, outs[1]);
            int64_t d = edge_v(in1, outs[0]);
            mb.EmitTri(a, b, c, ipt);
            mb.EmitTri(a, c, d, ipt);
          }
        }
      }
    }
  }

  *out_nv = int64_t(mb.verts.size() / 3);
  *out_nt = int64_t(mb.tris.size() / 3);
  *out_verts = (float*)malloc(mb.verts.size() * sizeof(float));
  *out_tris = (int64_t*)malloc(mb.tris.size() * sizeof(int64_t));
  std::memcpy(*out_verts, mb.verts.data(), mb.verts.size() * sizeof(float));
  std::memcpy(*out_tris, mb.tris.data(), mb.tris.size() * sizeof(int64_t));
  return 0;
}

void free_mesh(float* verts, int64_t* tris) {
  free(verts);
  free(tris);
}

}  // extern "C"
