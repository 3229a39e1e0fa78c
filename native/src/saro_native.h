/* saro_native — host-side native runtime for the saro_gs_tpu framework.
 *
 * TPU-native replacement for the reference's host/CUDA helper stack:
 *   - COLMAP binary parsers   (reference: scene/colmap_loader.py, pure python)
 *   - grid-hash KNN           (reference: simple_knn distCUDA2 + mmcv.ops.knn,
 *                              both CUDA — here multithreaded CPU; the TPU is
 *                              left free for the render/training path)
 *   - image decode + resize   (reference: PIL inside torch DataLoader workers,
 *                              scene/dataset.py:57-97 — here libjpeg/libpng +
 *                              PIL-parity Lanczos resampling on a C++ thread
 *                              pool, no GIL)
 *
 * Pure C API (ctypes-friendly).  All functions return 0 on success and a
 * negative errno-style code on failure.  Buffers returned through out-params
 * are malloc'd by the library and must be released with sn_free().
 */
#ifndef SARO_NATIVE_H
#define SARO_NATIVE_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* ------------------------------------------------------------------ misc */

void sn_free(void *p);
const char *sn_version(void);

/* --------------------------------------------------------- colmap parse */

/* points3D.bin -> xyz[3n] f64, rgb[3n] u8, err[n] f64 */
int sn_read_points3d_bin(const char *path, double **xyz, uint8_t **rgb,
                         double **err, int64_t *n);

/* images.bin -> per image: id, qvec[4] f64, tvec[3] f64, camera_id,
 * names as one \0-separated blob. point2D data is skipped (unused). */
int sn_read_images_bin(const char *path, int64_t *n, uint32_t **image_ids,
                       double **qvecs, double **tvecs, uint32_t **camera_ids,
                       char **names, int64_t *names_len);

/* cameras.bin -> id, model_id, width/height (interleaved [2n]),
 * params as a ragged blob with offsets[n+1]. */
int sn_read_cameras_bin(const char *path, int64_t *n, uint32_t **ids,
                        int32_t **model_ids, uint64_t **wh, double **params,
                        int64_t **param_offsets);

/* ------------------------------------------------------------------ knn */

/* Distance to the nearest *other* point, out[n].  Exact (grid-accelerated,
 * expanding-ring search), multithreaded. */
int sn_nn_distance(const float *pts, int64_t n, float *out, int nthreads);

/* Mean squared distance to the k nearest neighbours, out[n] — k=3 matches
 * simple_knn's distCUDA2 used for log-scale init. */
int sn_knn_mean_sq_dist(const float *pts, int64_t n, int k, float *out,
                        int nthreads);

/* --------------------------------------------------------------- images */

/* Decode a PNG or JPEG (sniffed by magic), Lanczos-resize to out_w x out_h
 * (PIL convention: support scaled by the downscale ratio), composite any
 * alpha over bg[3], write CHW float32 in [0,1] to out[3*out_h*out_w]. */
int sn_load_image(const char *path, int32_t out_w, int32_t out_h,
                  const float *bg, float *out);

/* Batch variant: n images decoded on an internal thread pool.
 * paths is an array of n C strings; out is [n,3,out_h,out_w] contiguous.
 * Returns 0 iff every image decoded; failing indices get -1 in status. */
int sn_load_images(const char *const *paths, int32_t n, int32_t out_w,
                   int32_t out_h, const float *bg, float *out,
                   int32_t nthreads, int32_t *status);

#ifdef __cplusplus
}
#endif

#endif /* SARO_NATIVE_H */
