/* Image decode (libpng/libjpeg) + PIL-convention Lanczos resampling.
 *
 * Host data path replacing the reference's PIL-in-DataLoader-worker decode
 * (scene/dataset.py:57-97, utils/general_utils.py PILtoTorch): decodes PNG
 * or JPEG, resizes with a separable Lanczos-3 filter whose support scales
 * with the downscale ratio (the same convention PIL uses, so outputs match
 * the python path to ~1/255), composites alpha over a background colour and
 * emits CHW float32.  The batch entry point fans out over std::thread
 * workers — image decode runs fully outside the GIL.
 */
#include "saro_native.h"

#include <cstdio>  // jpeglib.h needs FILE declared first

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct DecodedImage {
  int w = 0, h = 0, channels = 0;  // channels: 3 (RGB) or 4 (RGBA)
  std::vector<uint8_t> data;       // interleaved
};

/* ------------------------------------------------------------------ PNG */

bool decode_png(const char *path, DecodedImage *img) {
  png_image pimg;
  memset(&pimg, 0, sizeof(pimg));
  pimg.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&pimg, path)) return false;
  bool has_alpha = (pimg.format & PNG_FORMAT_FLAG_ALPHA) != 0;
  pimg.format = has_alpha ? PNG_FORMAT_RGBA : PNG_FORMAT_RGB;
  img->w = pimg.width;
  img->h = pimg.height;
  img->channels = has_alpha ? 4 : 3;
  img->data.resize(PNG_IMAGE_SIZE(pimg));
  if (!png_image_finish_read(&pimg, nullptr, img->data.data(), 0, nullptr)) {
    png_image_free(&pimg);
    return false;
  }
  return true;
}

/* ----------------------------------------------------------------- JPEG */

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr *>(cinfo->err)->jmp, 1);
}

bool decode_jpeg(const char *path, DecodedImage *img) {
  FILE *f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img->w = cinfo.output_width;
  img->h = cinfo.output_height;
  img->channels = 3;
  img->data.resize((size_t)img->w * img->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t *row = img->data.data() + (size_t)cinfo.output_scanline * img->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

bool decode_any(const char *path, DecodedImage *img) {
  FILE *f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[4] = {0};
  size_t got = fread(magic, 1, 4, f);
  fclose(f);
  if (got < 2) return false;
  if (magic[0] == 0x89 && magic[1] == 'P') return decode_png(path, img);
  if (magic[0] == 0xFF && magic[1] == 0xD8) return decode_jpeg(path, img);
  return false;
}

/* ------------------------------------------------- PIL-style resampling */

double lanczos3(double x) {
  if (x <= -3.0 || x >= 3.0) return 0.0;
  if (x == 0.0) return 1.0;
  double px = M_PI * x;
  return 3.0 * std::sin(px) * std::sin(px / 3.0) / (px * px);
}

struct ResampleAxis {
  int ksize;                 // max taps per output sample
  std::vector<int> bounds;   // [out*2]: (first src index, count)
  std::vector<double> kk;    // [out*ksize] weights
};

/* Mirror of PIL's precompute_coeffs (support scaled by downscale ratio). */
ResampleAxis precompute(int in_size, int out_size) {
  ResampleAxis ax;
  double scale = (double)in_size / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = 3.0 * filterscale;
  ax.ksize = (int)std::ceil(support) * 2 + 1;
  ax.bounds.resize(out_size * 2);
  ax.kk.resize((size_t)out_size * ax.ksize);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = (int)std::max(center - support + 0.5, 0.0);
    int xmax = (int)std::min(center + support + 0.5, (double)in_size);
    double *k = &ax.kk[(size_t)xx * ax.ksize];
    double ww = 0.0;
    for (int x = xmin; x < xmax; ++x) {
      double w = lanczos3((x - center + 0.5) / filterscale);
      k[x - xmin] = w;
      ww += w;
    }
    if (ww != 0.0)
      for (int x = 0; x < xmax - xmin; ++x) k[x] /= ww;
    ax.bounds[xx * 2] = xmin;
    ax.bounds[xx * 2 + 1] = xmax - xmin;
  }
  return ax;
}

/* Resize float planar data [c][in_h*in_w] -> [c][out_h*out_w]. */
void resize_planes(const std::vector<std::vector<float>> &in, int in_w,
                   int in_h, int out_w, int out_h,
                   std::vector<std::vector<float>> *out) {
  int c = (int)in.size();
  ResampleAxis axh = precompute(in_w, out_w);
  ResampleAxis axv = precompute(in_h, out_h);
  // horizontal pass
  std::vector<std::vector<float>> tmp(
      c, std::vector<float>((size_t)in_h * out_w));
  for (int ch = 0; ch < c; ++ch) {
    const float *src = in[ch].data();
    float *dst = tmp[ch].data();
    for (int y = 0; y < in_h; ++y) {
      const float *row = src + (size_t)y * in_w;
      for (int x = 0; x < out_w; ++x) {
        int xmin = axh.bounds[x * 2], cnt = axh.bounds[x * 2 + 1];
        const double *k = &axh.kk[(size_t)x * axh.ksize];
        double acc = 0.0;
        for (int i = 0; i < cnt; ++i) acc += row[xmin + i] * k[i];
        dst[(size_t)y * out_w + x] = (float)acc;
      }
    }
  }
  out->assign(c, std::vector<float>((size_t)out_h * out_w));
  for (int ch = 0; ch < c; ++ch) {
    const float *src = tmp[ch].data();
    float *dst = (*out)[ch].data();
    for (int y = 0; y < out_h; ++y) {
      int ymin = axv.bounds[y * 2], cnt = axv.bounds[y * 2 + 1];
      const double *k = &axv.kk[(size_t)y * axv.ksize];
      for (int x = 0; x < out_w; ++x) {
        double acc = 0.0;
        for (int i = 0; i < cnt; ++i)
          acc += src[(size_t)(ymin + i) * out_w + x] * k[i];
        dst[(size_t)y * out_w + x] = (float)acc;
      }
    }
  }
}

int load_one(const char *path, int out_w, int out_h, const float *bg,
             float *out) {
  DecodedImage img;
  if (!decode_any(path, &img)) return -1;
  int c = img.channels;
  std::vector<std::vector<float>> planes(
      c, std::vector<float>((size_t)img.w * img.h));
  const uint8_t *p = img.data.data();
  for (size_t i = 0, npix = (size_t)img.w * img.h; i < npix; ++i)
    for (int ch = 0; ch < c; ++ch)
      planes[ch][i] = p[i * c + ch] * (1.0f / 255.0f);
  if (c == 4) {
    // PIL resizes RGBA with premultiplied alpha; premultiplied colour also
    // composites over bg directly: out = rgb*a + bg*(1-a)
    for (int ch = 0; ch < 3; ++ch)
      for (size_t i = 0, npix = (size_t)img.w * img.h; i < npix; ++i)
        planes[ch][i] *= planes[3][i];
  }
  std::vector<std::vector<float>> resized;
  const std::vector<std::vector<float>> *use = &planes;
  if (img.w != out_w || img.h != out_h) {
    resize_planes(planes, img.w, img.h, out_w, out_h, &resized);
    use = &resized;
  }
  size_t npix = (size_t)out_w * out_h;
  if (c == 4) {
    const float *a = (*use)[3].data();
    for (int ch = 0; ch < 3; ++ch) {
      const float *src = (*use)[ch].data();   // premultiplied
      float *dst = out + (size_t)ch * npix;
      for (size_t i = 0; i < npix; ++i) {
        float al = std::min(std::max(a[i], 0.0f), 1.0f);
        float v = src[i] + bg[ch] * (1.0f - al);
        dst[i] = std::min(std::max(v, 0.0f), 1.0f);
      }
    }
  } else {
    for (int ch = 0; ch < 3; ++ch) {
      const float *src = (*use)[ch].data();
      float *dst = out + (size_t)ch * npix;
      for (size_t i = 0; i < npix; ++i)
        dst[i] = std::min(std::max(src[i], 0.0f), 1.0f);
    }
  }
  return 0;
}

}  // namespace

extern "C" int sn_load_image(const char *path, int32_t out_w, int32_t out_h,
                             const float *bg, float *out) {
  return load_one(path, out_w, out_h, bg, out);
}

extern "C" int sn_load_images(const char *const *paths, int32_t n,
                              int32_t out_w, int32_t out_h, const float *bg,
                              float *out, int32_t nthreads, int32_t *status) {
  if (n <= 0) return 0;
  if (nthreads <= 0) nthreads = std::thread::hardware_concurrency();
  nthreads = std::min(nthreads, n);
  std::atomic<int32_t> next(0);
  std::atomic<int32_t> failures(0);
  size_t stride = (size_t)3 * out_w * out_h;
  auto worker = [&]() {
    for (;;) {
      int32_t i = next.fetch_add(1);
      if (i >= n) return;
      int rc = load_one(paths[i], out_w, out_h, bg, out + stride * i);
      if (status) status[i] = rc;
      if (rc != 0) failures.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < nthreads; ++t) threads.emplace_back(worker);
  for (auto &t : threads) t.join();
  return failures.load() == 0 ? 0 : -1;
}

extern "C" void sn_free(void *p) { free(p); }

extern "C" const char *sn_version(void) { return "saro_native 0.1.0"; }
