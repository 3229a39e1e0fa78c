/* COLMAP binary-file parsers.
 *
 * File layouts follow the COLMAP on-disk format (the same one parsed in
 * python by the reference's scene/colmap_loader.py:113-282).  These are
 * startup-hot: a Neural3D scene merges 300 per-frame points3D.bin files.
 */
#include "saro_native.h"

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct File {
  FILE *f;
  explicit File(const char *path) : f(fopen(path, "rb")) {}
  ~File() {
    if (f) fclose(f);
  }
};

bool read_exact(FILE *f, void *dst, size_t bytes) {
  return fread(dst, 1, bytes, f) == bytes;
}

template <typename T>
bool read_pod(FILE *f, T *out) {
  return read_exact(f, out, sizeof(T));
}

template <typename T>
T *dup_vec(const std::vector<T> &v) {
  T *p = static_cast<T *>(malloc(v.size() * sizeof(T) + 1));
  if (p && !v.empty()) memcpy(p, v.data(), v.size() * sizeof(T));
  return p;
}

}  // namespace

extern "C" int sn_read_points3d_bin(const char *path, double **xyz,
                                    uint8_t **rgb, double **err, int64_t *n) {
  File file(path);
  if (!file.f) return -1;
  uint64_t num = 0;
  if (!read_pod(file.f, &num)) return -2;
  std::vector<double> vxyz(num * 3);
  std::vector<uint8_t> vrgb(num * 3);
  std::vector<double> verr(num);
  for (uint64_t i = 0; i < num; ++i) {
    uint64_t id;
    if (!read_pod(file.f, &id)) return -2;
    if (!read_exact(file.f, &vxyz[i * 3], 3 * sizeof(double))) return -2;
    if (!read_exact(file.f, &vrgb[i * 3], 3)) return -2;
    if (!read_pod(file.f, &verr[i])) return -2;
    uint64_t track_len;
    if (!read_pod(file.f, &track_len)) return -2;
    if (fseek(file.f, (long)(track_len * 8), SEEK_CUR) != 0) return -2;
  }
  *xyz = dup_vec(vxyz);
  *rgb = dup_vec(vrgb);
  *err = dup_vec(verr);
  *n = (int64_t)num;
  return (*xyz && *rgb && *err) ? 0 : -3;
}

extern "C" int sn_read_images_bin(const char *path, int64_t *n,
                                  uint32_t **image_ids, double **qvecs,
                                  double **tvecs, uint32_t **camera_ids,
                                  char **names, int64_t *names_len) {
  File file(path);
  if (!file.f) return -1;
  uint64_t num = 0;
  if (!read_pod(file.f, &num)) return -2;
  std::vector<uint32_t> vid(num), vcam(num);
  std::vector<double> vq(num * 4), vt(num * 3);
  std::string blob;
  for (uint64_t i = 0; i < num; ++i) {
    if (!read_pod(file.f, &vid[i])) return -2;
    if (!read_exact(file.f, &vq[i * 4], 4 * sizeof(double))) return -2;
    if (!read_exact(file.f, &vt[i * 3], 3 * sizeof(double))) return -2;
    if (!read_pod(file.f, &vcam[i])) return -2;
    int c;
    while ((c = fgetc(file.f)) > 0) blob.push_back((char)c);
    if (c < 0) return -2;
    blob.push_back('\0');
    uint64_t npts;
    if (!read_pod(file.f, &npts)) return -2;
    if (fseek(file.f, (long)(npts * 24), SEEK_CUR) != 0) return -2;
  }
  *image_ids = dup_vec(vid);
  *camera_ids = dup_vec(vcam);
  *qvecs = dup_vec(vq);
  *tvecs = dup_vec(vt);
  char *nb = static_cast<char *>(malloc(blob.size() + 1));
  if (nb) memcpy(nb, blob.data(), blob.size());
  *names = nb;
  *names_len = (int64_t)blob.size();
  *n = (int64_t)num;
  return (*image_ids && *camera_ids && *qvecs && *tvecs && nb) ? 0 : -3;
}

extern "C" int sn_read_cameras_bin(const char *path, int64_t *n,
                                   uint32_t **ids, int32_t **model_ids,
                                   uint64_t **wh, double **params,
                                   int64_t **param_offsets) {
  /* Parameter counts per COLMAP camera model id (0..10). */
  static const int kNumParams[] = {3, 4, 4, 5, 8, 8, 12, 5, 4, 5, 12};
  File file(path);
  if (!file.f) return -1;
  uint64_t num = 0;
  if (!read_pod(file.f, &num)) return -2;
  std::vector<uint32_t> vid(num);
  std::vector<int32_t> vmodel(num);
  std::vector<uint64_t> vwh(num * 2);
  std::vector<double> vparams;
  std::vector<int64_t> voff(num + 1, 0);
  for (uint64_t i = 0; i < num; ++i) {
    if (!read_pod(file.f, &vid[i])) return -2;
    if (!read_pod(file.f, &vmodel[i])) return -2;
    if (!read_exact(file.f, &vwh[i * 2], 2 * sizeof(uint64_t))) return -2;
    int32_t m = vmodel[i];
    if (m < 0 || m > 10) return -4;
    int np = kNumParams[m];
    size_t base = vparams.size();
    vparams.resize(base + np);
    if (!read_exact(file.f, &vparams[base], np * sizeof(double))) return -2;
    voff[i + 1] = (int64_t)vparams.size();
  }
  *ids = dup_vec(vid);
  *model_ids = dup_vec(vmodel);
  *wh = dup_vec(vwh);
  *params = dup_vec(vparams);
  *param_offsets = dup_vec(voff);
  *n = (int64_t)num;
  return (*ids && *model_ids && *wh && *params && *param_offsets) ? 0 : -3;
}
