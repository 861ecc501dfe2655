// Native host-side geometry kernels for the asset pipeline.
//
// The reference renderer is fully native (Rust); in the rebuild the TPU owns
// the compute path and this library owns the host-side mesh conditioning the
// loader needs before upload (SURVEY.md §3.4): tangent-space generation for
// meshes without TANGENT accessors (the reference defaults to +X,
// resources/src/model.rs:187-197 — correct normal mapping needs real
// tangents), area-weighted normal generation, and epsilon vertex welding for
// index reuse. Exposed through a plain C ABI consumed via ctypes
// (resources/geometry.py), with a numpy fallback when the library isn't
// built.
//
// Build: make -C native  (produces libgeometry.so)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// Per-triangle tangent accumulation + Gram-Schmidt orthonormalization with
// handedness in w (Lengyel's method; the standard MikkTSpace-compatible
// approximation for indexed meshes).
void compute_tangents(const float* positions,  // [n_verts*3]
                      const float* normals,    // [n_verts*3]
                      const float* uvs,        // [n_verts*2]
                      const uint32_t* indices, // [n_idx]
                      int64_t n_verts, int64_t n_idx,
                      float* out_tangents /* [n_verts*4] */) {
  std::vector<float> tan(n_verts * 3, 0.0f);
  std::vector<float> bitan(n_verts * 3, 0.0f);

  for (int64_t t = 0; t + 2 < n_idx; t += 3) {
    uint32_t i0 = indices[t], i1 = indices[t + 1], i2 = indices[t + 2];
    const float* p0 = positions + 3 * i0;
    const float* p1 = positions + 3 * i1;
    const float* p2 = positions + 3 * i2;
    const float* w0 = uvs + 2 * i0;
    const float* w1 = uvs + 2 * i1;
    const float* w2 = uvs + 2 * i2;

    float e1[3] = {p1[0] - p0[0], p1[1] - p0[1], p1[2] - p0[2]};
    float e2[3] = {p2[0] - p0[0], p2[1] - p0[1], p2[2] - p0[2]};
    float du1 = w1[0] - w0[0], dv1 = w1[1] - w0[1];
    float du2 = w2[0] - w0[0], dv2 = w2[1] - w0[1];

    float det = du1 * dv2 - du2 * dv1;
    if (std::fabs(det) < 1e-12f) continue;
    float r = 1.0f / det;
    float T[3] = {(dv2 * e1[0] - dv1 * e2[0]) * r,
                  (dv2 * e1[1] - dv1 * e2[1]) * r,
                  (dv2 * e1[2] - dv1 * e2[2]) * r};
    float B[3] = {(du1 * e2[0] - du2 * e1[0]) * r,
                  (du1 * e2[1] - du2 * e1[1]) * r,
                  (du1 * e2[2] - du2 * e1[2]) * r};
    for (uint32_t idx : {i0, i1, i2}) {
      for (int k = 0; k < 3; ++k) {
        tan[3 * idx + k] += T[k];
        bitan[3 * idx + k] += B[k];
      }
    }
  }

  for (int64_t v = 0; v < n_verts; ++v) {
    const float* n = normals + 3 * v;
    const float* t = tan.data() + 3 * v;
    const float* b = bitan.data() + 3 * v;
    // Gram-Schmidt: T' = normalize(T - N * dot(N, T))
    float ndott = n[0] * t[0] + n[1] * t[1] + n[2] * t[2];
    float tx = t[0] - n[0] * ndott;
    float ty = t[1] - n[1] * ndott;
    float tz = t[2] - n[2] * ndott;
    float len = std::sqrt(tx * tx + ty * ty + tz * tz);
    if (len < 1e-12f) {  // degenerate: fall back to the loader default (+X)
      out_tangents[4 * v + 0] = 1.0f;
      out_tangents[4 * v + 1] = 0.0f;
      out_tangents[4 * v + 2] = 0.0f;
      out_tangents[4 * v + 3] = 1.0f;
      continue;
    }
    tx /= len; ty /= len; tz /= len;
    // handedness: sign(dot(cross(N, T), B))
    float cx = n[1] * tz - n[2] * ty;
    float cy = n[2] * tx - n[0] * tz;
    float cz = n[0] * ty - n[1] * tx;
    float hand = (cx * b[0] + cy * b[1] + cz * b[2]) < 0.0f ? -1.0f : 1.0f;
    out_tangents[4 * v + 0] = tx;
    out_tangents[4 * v + 1] = ty;
    out_tangents[4 * v + 2] = tz;
    out_tangents[4 * v + 3] = hand;
  }
}

// Area-weighted vertex normals (cross products accumulate un-normalized, so
// larger triangles contribute more), then normalize; zero-area fallback +Y.
void compute_normals(const float* positions, const uint32_t* indices,
                     int64_t n_verts, int64_t n_idx,
                     float* out_normals /* [n_verts*3] */) {
  std::memset(out_normals, 0, sizeof(float) * 3 * n_verts);
  for (int64_t t = 0; t + 2 < n_idx; t += 3) {
    uint32_t i0 = indices[t], i1 = indices[t + 1], i2 = indices[t + 2];
    const float* p0 = positions + 3 * i0;
    const float* p1 = positions + 3 * i1;
    const float* p2 = positions + 3 * i2;
    float e1[3] = {p1[0] - p0[0], p1[1] - p0[1], p1[2] - p0[2]};
    float e2[3] = {p2[0] - p0[0], p2[1] - p0[1], p2[2] - p0[2]};
    float c[3] = {e1[1] * e2[2] - e1[2] * e2[1],
                  e1[2] * e2[0] - e1[0] * e2[2],
                  e1[0] * e2[1] - e1[1] * e2[0]};
    for (uint32_t idx : {i0, i1, i2})
      for (int k = 0; k < 3; ++k) out_normals[3 * idx + k] += c[k];
  }
  for (int64_t v = 0; v < n_verts; ++v) {
    float* n = out_normals + 3 * v;
    float len = std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
    if (len < 1e-12f) { n[0] = 0.0f; n[1] = 1.0f; n[2] = 0.0f; }
    else { n[0] /= len; n[1] /= len; n[2] /= len; }
  }
}

// Quantized vertex welding: positions snapped to `eps` cells; first vertex
// in a cell wins. Returns the number of unique vertices; fills remap
// (old index -> new index) so callers can rebuild attribute streams and
// index buffers.
int64_t weld_vertices(const float* positions, int64_t n_verts, float eps,
                      uint32_t* out_remap /* [n_verts] */) {
  struct Key {
    int64_t x, y, z;
    bool operator==(const Key& o) const { return x == o.x && y == o.y && z == o.z; }
  };
  struct KeyHash {
    size_t operator()(const Key& k) const {
      return static_cast<size_t>(k.x * 73856093LL ^ k.y * 19349663LL ^ k.z * 83492791LL);
    }
  };
  std::unordered_map<Key, uint32_t, KeyHash> cells;
  cells.reserve(static_cast<size_t>(n_verts));
  float inv = eps > 0.0f ? 1.0f / eps : 0.0f;
  uint32_t next = 0;
  for (int64_t v = 0; v < n_verts; ++v) {
    Key k;
    if (eps > 0.0f) {
      k = {static_cast<int64_t>(std::llround(positions[3 * v + 0] * inv)),
           static_cast<int64_t>(std::llround(positions[3 * v + 1] * inv)),
           static_cast<int64_t>(std::llround(positions[3 * v + 2] * inv))};
    } else {
      k = {static_cast<int64_t>(v), 0, 0};  // eps<=0: no welding
    }
    auto it = cells.find(k);
    if (it == cells.end()) {
      cells.emplace(k, next);
      out_remap[v] = next++;
    } else {
      out_remap[v] = it->second;
    }
  }
  return static_cast<int64_t>(next);
}

}  // extern "C"
