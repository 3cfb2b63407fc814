// Native host-side runtime ops for the TPU data path.
//
// The reference rides torch's C++ DataLoader workers and mmcv's C pipelines
// for its host-side data work (reference: projects/mmdet3d_plugin/datasets/
// pipelines/loading.py:97-241, tools/data_converter/*); here the equivalent
// numeric kernels are plain C++ with a C ABI, called from Python via ctypes.
// ctypes releases the GIL for the duration of each call, so a Python
// ThreadPoolExecutor over these functions gives a true multi-core host
// pipeline without worker processes.
//
// Build: python -m vidar_tpu.native.build  (cached; see build.py)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <vector>

#include <csetjmp>
#include <cstdio>
#include <jpeglib.h>

extern "C" {

// ---------------------------------------------------------------- points ---

// Keep at most one point per voxel (first occurrence in voxel-key order),
// at most max_voxels voxels; returns kept original-point indices sorted
// ascending. Mirrors data/pipeline.py:voxel_downsample_points (reference
// CustomVoxelBasedPointSampler, loading.py:226-241).
// pts: [n, dims] float32 (x,y,z first); out_idx: capacity >= max_voxels.
// Returns number of kept points.
int vt_voxel_downsample(const float* pts, int n, int dims,
                        const float* pc_range, const float* voxel_size,
                        int max_voxels, int* out_idx) {
  const double dx = std::ceil((pc_range[3] - pc_range[0]) / voxel_size[0]);
  const double dy = std::ceil((pc_range[4] - pc_range[1]) / voxel_size[1]);
  const double dz = std::ceil((pc_range[5] - pc_range[2]) / voxel_size[2]);
  const int64_t dyi = (int64_t)dy, dzi = (int64_t)dz;
  (void)dx;
  // key -> first original index, ordered by key (np.unique sorts keys and
  // truncation keeps the lowest-key voxels).
  std::map<int64_t, int> first;
  for (int i = 0; i < n; ++i) {
    const float* p = pts + (size_t)i * dims;
    if (p[0] < pc_range[0] || p[0] >= pc_range[3] ||
        p[1] < pc_range[1] || p[1] >= pc_range[4] ||
        p[2] < pc_range[2] || p[2] >= pc_range[5])
      continue;
    const int64_t cx = (int64_t)std::floor((p[0] - pc_range[0]) / voxel_size[0]);
    const int64_t cy = (int64_t)std::floor((p[1] - pc_range[1]) / voxel_size[1]);
    const int64_t cz = (int64_t)std::floor((p[2] - pc_range[2]) / voxel_size[2]);
    const int64_t key = (cx * dyi + cy) * dzi + cz;
    first.emplace(key, i);  // keeps the FIRST i for a repeated key
  }
  std::vector<int> kept;
  kept.reserve(std::min<size_t>(first.size(), (size_t)max_voxels));
  int taken = 0;
  for (auto& kv : first) {
    if (taken++ >= max_voxels) break;
    kept.push_back(kv.second);
  }
  std::sort(kept.begin(), kept.end());
  std::memcpy(out_idx, kept.data(), kept.size() * sizeof(int));
  return (int)kept.size();
}

// Combined ego-box + close-radius filter. keep[i]=1 when the point survives.
// ego_box: [x0, y0, x1, y1] (drop points inside); radius<=0 disables the
// close filter. Mirrors data/pipeline.py:ego_mask_filter/remove_close.
void vt_point_filter(const float* pts, int n, int dims, const float* ego_box,
                     float radius, uint8_t* keep) {
  const bool use_ego = ego_box != nullptr;
  const float r2 = radius * radius;
  for (int i = 0; i < n; ++i) {
    const float* p = pts + (size_t)i * dims;
    bool k = true;
    if (use_ego && p[0] >= ego_box[0] && p[0] <= ego_box[2] &&
        p[1] >= ego_box[1] && p[1] <= ego_box[3])
      k = false;
    if (k && radius > 0.f && (p[0] * p[0] + p[1] * p[1]) < r2) k = false;
    keep[i] = k ? 1 : 0;
  }
}

// In-place rigid transform of xyz (rows of a 3x3 rotation applied + t).
// rot: row-major [3,3] applied as p' = p @ rot + t (numpy convention of
// data/pipeline.py:load_multi_sweeps).
void vt_transform_points(float* pts, int n, int dims, const float* rot,
                         const float* t) {
  for (int i = 0; i < n; ++i) {
    float* p = pts + (size_t)i * dims;
    const float x = p[0], y = p[1], z = p[2];
    p[0] = x * rot[0] + y * rot[3] + z * rot[6] + t[0];
    p[1] = x * rot[1] + y * rot[4] + z * rot[7] + t[1];
    p[2] = x * rot[2] + y * rot[5] + z * rot[8] + t[2];
  }
}

// ---------------------------------------------------------------- images ---

// Fused RGB->BGR + mean/std normalize + zero-pad to (ph, pw).
// img: [h, w, 3] float32 RGB; out: [ph, pw, 3] float32 (pre-zeroed NOT
// required). Mirrors data/pipeline.py:normalize_images + pad_images
// (img_norm_cfg: caffe BGR mean subtract).
void vt_normalize_pad(const float* img, int h, int w, int ph, int pw,
                      const float* mean, const float* std_, int to_bgr,
                      float* out) {
  const float inv0 = 1.f / std_[0], inv1 = 1.f / std_[1], inv2 = 1.f / std_[2];
  for (int y = 0; y < ph; ++y) {
    float* orow = out + (size_t)y * pw * 3;
    if (y >= h) {
      std::memset(orow, 0, (size_t)pw * 3 * sizeof(float));
      continue;
    }
    const float* irow = img + (size_t)y * w * 3;
    for (int x = 0; x < w; ++x) {
      const float r = irow[x * 3 + 0];
      const float g = irow[x * 3 + 1];
      const float b = irow[x * 3 + 2];
      if (to_bgr) {
        orow[x * 3 + 0] = (b - mean[0]) * inv0;
        orow[x * 3 + 1] = (g - mean[1]) * inv1;
        orow[x * 3 + 2] = (r - mean[2]) * inv2;
      } else {
        orow[x * 3 + 0] = (r - mean[0]) * inv0;
        orow[x * 3 + 1] = (g - mean[1]) * inv1;
        orow[x * 3 + 2] = (b - mean[2]) * inv2;
      }
    }
    std::memset(orow + (size_t)w * 3, 0,
                (size_t)(pw - w) * 3 * sizeof(float));
  }
}

// --------------------------------------------------------------- jpeg -----

struct VtJpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void vt_jpeg_error_exit(j_common_ptr cinfo) {
  VtJpegErr* err = reinterpret_cast<VtJpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

// Returns 0 on success; fills h/w/channels.
int vt_jpeg_info(const uint8_t* data, size_t len, int* h, int* w, int* c) {
  jpeg_decompress_struct cinfo;
  VtJpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = vt_jpeg_error_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);
  *h = (int)cinfo.image_height;
  *w = (int)cinfo.image_width;
  *c = (int)cinfo.num_components;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode to RGB uint8 [h, w, 3]. Returns 0 on success.
int vt_jpeg_decode(const uint8_t* data, size_t len, uint8_t* out,
                   int out_h, int out_w) {
  jpeg_decompress_struct cinfo;
  VtJpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = vt_jpeg_error_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if ((int)cinfo.output_height != out_h || (int)cinfo.output_width != out_w ||
      cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + (size_t)cinfo.output_scanline * out_w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// ----------------------------------------------------------------- knn ----

// Brute-force 1-NN from each src point to dst set (squared L2 over xyz).
// Tiled over dst for cache locality. Mirrors the chamferdist K=1 eval path
// (reference third_lib/chamfer_dist/.../knn.cu:22-253 semantics, K=1).
void vt_knn_1nn(const float* src, int n, const float* dst, int m,
                float* out_d2, int* out_idx) {
  constexpr int TILE = 512;
  std::vector<float> best(n, 3.4e38f);
  std::vector<int> bidx(n, 0);
  for (int j0 = 0; j0 < m; j0 += TILE) {
    const int j1 = std::min(m, j0 + TILE);
    for (int i = 0; i < n; ++i) {
      const float sx = src[i * 3], sy = src[i * 3 + 1], sz = src[i * 3 + 2];
      float bd = best[i];
      int bi = bidx[i];
      for (int j = j0; j < j1; ++j) {
        const float ddx = sx - dst[j * 3];
        const float ddy = sy - dst[j * 3 + 1];
        const float ddz = sz - dst[j * 3 + 2];
        const float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
        if (d2 < bd) { bd = d2; bi = j; }
      }
      best[i] = bd;
      bidx[i] = bi;
    }
  }
  std::memcpy(out_d2, best.data(), n * sizeof(float));
  std::memcpy(out_idx, bidx.data(), n * sizeof(int));
}

}  // extern "C"
