// Native clip decoder: JPEG/PNG decode -> PIL-parity bilinear resize ->
// crop(s) -> resize -> optional hflip, fused in one C++ pass per frame.
//
// Role (SURVEY.md §6): the reference is dataloader-bound (data_time 30-50%
// of a step, torch DataLoader + PIL).  This library is the TPU-native
// equivalent of that native input path: the Python side keeps ALL
// parity-sensitive logic (crop-candidate sampling, offset grids, rng
// streams — ehgr_tpu/ops/spatial_transforms.py) and passes resolved
// geometry down; C++ does only pixel work, multi-threaded, writing
// straight into a preallocated uint8 [crops, T, H, W, C] batch slot.
//
// Parity contracts (tested in tests/test_native_io.py):
//  * JPEG decode == PIL (both libjpeg, JDCT_ISLOW default).
//  * Resize replicates PIL's ImagingResample fixed-point bilinear
//    (PRECISION_BITS = 32-8-2, horizontal-then-vertical) bit-exactly.
//  * RGB->L uses PIL's ITU-R 601-2 integer rounding (L24 >> 16).
//
// Exposed via ctypes from ehgr_tpu/data/native_io.py (no pybind11 in this
// image); built on demand with g++ -O3 -shared -ljpeg -lpng.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

// ---------------------------------------------------------------------------
// PIL-parity resample (Pillow src/libImaging/Resample.c, bilinear filter)
// ---------------------------------------------------------------------------

constexpr int PRECISION_BITS = 32 - 8 - 2;

inline uint8_t clip8(int in) {
  if (in >= (1 << PRECISION_BITS << 8)) return 255;
  if (in <= 0) return 0;
  return static_cast<uint8_t>(in >> PRECISION_BITS);
}

inline double bilinear_filter(double x) {
  if (x < 0.0) x = -x;
  return x < 1.0 ? 1.0 - x : 0.0;
}

// Precompute per-output-pixel source bounds and fixed-point coefficients.
int precompute_coeffs(int in_size, int out_size, std::vector<int>& bounds,
                      std::vector<int32_t>& kk) {
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = 1.0 * filterscale;  // bilinear support = 1.0
  int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  bounds.resize(out_size * 2);
  std::vector<double> pre(out_size * ksize, 0.0);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    double ww = 0.0, ss = 1.0 / filterscale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double* k = &pre[static_cast<size_t>(xx) * ksize];
    for (int x = 0; x < xmax; ++x) {
      double w = bilinear_filter((x + xmin - center + 0.5) * ss);
      k[x] = w;
      ww += w;
    }
    for (int x = 0; x < xmax; ++x)
      if (ww != 0.0) k[x] /= ww;
    bounds[xx * 2 + 0] = xmin;
    bounds[xx * 2 + 1] = xmax;
  }
  kk.resize(pre.size());
  for (size_t i = 0; i < pre.size(); ++i)
    kk[i] = static_cast<int32_t>(pre[i] < 0
                                     ? -0.5 + pre[i] * (1 << PRECISION_BITS)
                                     : 0.5 + pre[i] * (1 << PRECISION_BITS));
  return ksize;
}

// Interleaved uint8 [h, w, c] resample, horizontal pass then vertical
// (Pillow's ImagingResampleInner order).
void resample(const uint8_t* in, int iw, int ih, int c, uint8_t* out, int ow,
              int oh) {
  std::vector<int> bounds;
  std::vector<int32_t> kk;
  // horizontal: [ih, iw, c] -> [ih, ow, c]
  std::vector<uint8_t> tmp(static_cast<size_t>(ih) * ow * c);
  {
    int ksize = precompute_coeffs(iw, ow, bounds, kk);
    for (int y = 0; y < ih; ++y) {
      const uint8_t* row = in + static_cast<size_t>(y) * iw * c;
      uint8_t* orow = tmp.data() + static_cast<size_t>(y) * ow * c;
      for (int xx = 0; xx < ow; ++xx) {
        int xmin = bounds[xx * 2 + 0], xmax = bounds[xx * 2 + 1];
        const int32_t* k = &kk[static_cast<size_t>(xx) * ksize];
        for (int ch = 0; ch < c; ++ch) {
          int ss = 1 << (PRECISION_BITS - 1);
          for (int x = 0; x < xmax; ++x)
            ss += row[(xmin + x) * c + ch] * k[x];
          orow[xx * c + ch] = clip8(ss);
        }
      }
    }
  }
  // vertical: [ih, ow, c] -> [oh, ow, c]
  {
    int ksize = precompute_coeffs(ih, oh, bounds, kk);
    for (int yy = 0; yy < oh; ++yy) {
      int ymin = bounds[yy * 2 + 0], ymax = bounds[yy * 2 + 1];
      const int32_t* k = &kk[static_cast<size_t>(yy) * ksize];
      uint8_t* orow = out + static_cast<size_t>(yy) * ow * c;
      for (int x = 0; x < ow * c; ++x) {
        int ss = 1 << (PRECISION_BITS - 1);
        for (int y = 0; y < ymax; ++y)
          ss += tmp[(static_cast<size_t>(ymin + y) * ow * c) + x] * k[y];
        orow[x] = clip8(ss);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// decoders
// ---------------------------------------------------------------------------

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<ErrMgr*>(cinfo->err)->jump, 1);
}

// Decode JPEG -> interleaved uint8; returns channels (1|3) or -1.
// full_w/full_h get the pre-scaling image size.  When min_w/min_h > 0 the
// IDCT runs at the largest 1/2^k scale still covering (min_w, min_h) —
// the opt-in fast path (trades bit-parity with PIL's full decode for
// ~2-4x less IDCT + resample work when downscaling).
int decode_jpeg(FILE* f, std::vector<uint8_t>& buf, int* w, int* h,
                int* full_w, int* full_h, int min_w, int min_h) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  *full_w = cinfo.image_width;
  *full_h = cinfo.image_height;
  // PIL parity: default JDCT_ISLOW, no scaling; force gray/RGB out
  cinfo.out_color_space =
      cinfo.jpeg_color_space == JCS_GRAYSCALE ? JCS_GRAYSCALE : JCS_RGB;
  if (min_w > 0 && min_h > 0) {
    for (int denom = 8; denom >= 2; denom /= 2) {
      long sw = (static_cast<long>(cinfo.image_width) + denom - 1) / denom;
      long sh = (static_cast<long>(cinfo.image_height) + denom - 1) / denom;
      if (sw >= min_w && sh >= min_h) {
        cinfo.scale_num = 1;
        cinfo.scale_denom = denom;
        break;
      }
    }
  }
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  int c = cinfo.output_components;
  buf.resize(static_cast<size_t>(*w) * *h * c);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = buf.data() +
                   static_cast<size_t>(cinfo.output_scanline) * *w * c;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return c;
}

// Decode 8-bit PNG -> interleaved uint8 gray or RGB; returns channels or -1.
int decode_png(FILE* f, std::vector<uint8_t>& buf, int* w, int* h) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return -1;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return -1;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -1;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_strip_16(png);     // 16-bit -> 8 (PIL 'L' convert of I;16 differs;
                             // callers needing that path use the PIL fallback)
  png_set_strip_alpha(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  png_read_update_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  int c = png_get_channels(png, info);
  if (c != 1 && c != 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -1;
  }
  buf.resize(static_cast<size_t>(*w) * *h * c);
  std::vector<png_bytep> rows(*h);
  for (int y = 0; y < *h; ++y)
    rows[y] = buf.data() + static_cast<size_t>(y) * *w * c;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return c;
}

// min_w/min_h > 0 enables JPEG DCT-scaled decode (fast path); full_w/full_h
// always report the pre-scaling size (the geometry-contract dimensions).
int decode_file(const char* path, std::vector<uint8_t>& buf, int* w, int* h,
                int* full_w, int* full_h, int min_w = 0, int min_h = 0) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  unsigned char magic[2] = {0, 0};
  if (std::fread(magic, 1, 2, f) != 2) {
    std::fclose(f);
    return -1;
  }
  std::rewind(f);
  int c;
  if (magic[0] == 0xFF && magic[1] == 0xD8) {
    c = decode_jpeg(f, buf, w, h, full_w, full_h, min_w, min_h);
  } else if (magic[0] == 0x89 && magic[1] == 'P') {
    c = decode_png(f, buf, w, h);
    *full_w = *w;
    *full_h = *h;
  } else {
    c = -1;
  }
  std::fclose(f);
  return c;
}

// PIL RGB->L: (R*19595 + G*38470 + B*7471 + 0x8000) >> 16  (convert.c L24)
void rgb_to_gray(const uint8_t* in, uint8_t* out, size_t n) {
  for (size_t i = 0; i < n; ++i) {
    const uint8_t* p = in + i * 3;
    out[i] = static_cast<uint8_t>(
        (p[0] * 19595u + p[1] * 38470u + p[2] * 7471u + 0x8000u) >> 16);
  }
}

void gray_to_rgb(const uint8_t* in, uint8_t* out, size_t n) {
  for (size_t i = 0; i < n; ++i) out[i * 3] = out[i * 3 + 1] = out[i * 3 + 2] = in[i];
}

// crop rect from [h,w,c], optional hflip, into out [ch_out rows]
void crop_flip(const uint8_t* in, int iw, int c, int x, int y, int cw, int ch,
               bool flip, uint8_t* out) {
  for (int row = 0; row < ch; ++row) {
    const uint8_t* src =
        in + (static_cast<size_t>(y + row) * iw + x) * c;
    uint8_t* dst = out + static_cast<size_t>(row) * cw * c;
    if (!flip) {
      std::memcpy(dst, src, static_cast<size_t>(cw) * c);
    } else {
      for (int col = 0; col < cw; ++col)
        std::memcpy(dst + static_cast<size_t>(col) * c,
                    src + static_cast<size_t>(cw - 1 - col) * c, c);
    }
  }
}

// Full per-frame pipeline; returns 0 ok / negative error code.
// fast != 0 allows DCT-scaled JPEG decode when a resize to (sw, sh)
// follows — geometry is unchanged (rects stay in (sw, sh) space), only the
// resample source resolution drops.
int process_frame(const char* path, int exp_w, int exp_h, int sw, int sh,
                  const int* rects, const int* flips, int n_crops, int ow,
                  int oh, int channels, uint8_t* out, size_t crop_stride,
                  int fast) {
  std::vector<uint8_t> raw;
  int w = 0, h = 0, full_w = 0, full_h = 0;
  bool scaling = sw > 0 && sh > 0;
  int c = decode_file(path, raw, &w, &h, &full_w, &full_h,
                      fast && scaling ? sw : 0, fast && scaling ? sh : 0);
  if (c < 0) return -1;                            // decode failure
  if (full_w != exp_w || full_h != exp_h) return -2;  // frame-size mismatch
  // channel convert first (PIL: .convert(mode) happens before transforms)
  std::vector<uint8_t> conv;
  if (c != channels) {
    conv.resize(static_cast<size_t>(w) * h * channels);
    if (channels == 1)
      rgb_to_gray(raw.data(), conv.data(), static_cast<size_t>(w) * h);
    else
      gray_to_rgb(raw.data(), conv.data(), static_cast<size_t>(w) * h);
    raw.swap(conv);
    c = channels;
  }
  // scale to (sw, sh) if requested and different
  std::vector<uint8_t> scaled;
  const uint8_t* base = raw.data();
  int bw = w, bh = h;
  if (scaling && (sw != w || sh != h)) {
    scaled.resize(static_cast<size_t>(sw) * sh * c);
    resample(raw.data(), w, h, c, scaled.data(), sw, sh);
    base = scaled.data();
    bw = sw;
    bh = sh;
  }
  std::vector<uint8_t> cropbuf;
  for (int k = 0; k < n_crops; ++k) {
    int cx = rects[k * 4], cy = rects[k * 4 + 1], cw = rects[k * 4 + 2],
        ch = rects[k * 4 + 3];
    if (cx < 0 || cy < 0 || cx + cw > bw || cy + ch > bh) return -3;
    uint8_t* dst = out + static_cast<size_t>(k) * crop_stride;
    if (cw == ow && ch == oh) {
      crop_flip(base, bw, c, cx, cy, cw, ch, flips[k], dst);
    } else {
      cropbuf.resize(static_cast<size_t>(cw) * ch * c);
      crop_flip(base, bw, c, cx, cy, cw, ch, flips[k], cropbuf.data());
      resample(cropbuf.data(), cw, ch, c, dst, ow, oh);
    }
  }
  return 0;
}

}  // namespace

extern "C" {

// Header-only size probe (for geometry planning without a full decode).
int ehgr_image_size(const char* path, int* w, int* h) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  unsigned char magic[2] = {0, 0};
  if (std::fread(magic, 1, 2, f) != 2) {
    std::fclose(f);
    return -1;
  }
  std::rewind(f);
  int rc = -1;
  if (magic[0] == 0xFF && magic[1] == 0xD8) {
    jpeg_decompress_struct cinfo;
    ErrMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_err_exit;
    if (!setjmp(jerr.jump)) {
      jpeg_create_decompress(&cinfo);
      jpeg_stdio_src(&cinfo, f);
      jpeg_read_header(&cinfo, TRUE);
      *w = cinfo.image_width;
      *h = cinfo.image_height;
      rc = 0;
    }
    jpeg_destroy_decompress(&cinfo);
  } else if (magic[0] == 0x89 && magic[1] == 'P') {
    unsigned char hdr[24];
    if (std::fread(hdr, 1, 24, f) == 24) {
      *w = (hdr[16] << 24) | (hdr[17] << 16) | (hdr[18] << 8) | hdr[19];
      *h = (hdr[20] << 24) | (hdr[21] << 16) | (hdr[22] << 8) | hdr[23];
      rc = 0;
    }
  }
  std::fclose(f);
  return rc;
}

// Decode a clip: t frame paths -> out [n_crops, t, oh, ow, channels] uint8
// (crop-major, matching the PIL multi-crop transforms' frame order).
//   exp_w/exp_h: every frame must decode to this size (else -2).
//   sw/sh: post-decode resize target (0/0 = none); rects are in the
//          scaled coordinate space.
//   rects: [n_crops*4] as (x, y, w, h); flips: [n_crops] 0/1.
//   ow/oh: final per-crop size (rects resized here when different).
//   n_threads: frame-level parallelism (<=0 = hardware_concurrency).
//   fast: nonzero allows DCT-scaled JPEG decode when a resize follows
//         (not bit-identical to the PIL path; geometry unchanged).
// Returns 0, or the first nonzero per-frame error.
int ehgr_decode_clip(const char** paths, int t, int exp_w, int exp_h, int sw,
                     int sh, const int* rects, const int* flips, int n_crops,
                     int ow, int oh, int channels, unsigned char* out,
                     int n_threads, int fast) {
  if (t <= 0 || n_crops <= 0 || (channels != 1 && channels != 3)) return -4;
  size_t frame_sz = static_cast<size_t>(oh) * ow * channels;
  size_t crop_stride = static_cast<size_t>(t) * frame_sz;  // crop-major
  if (n_threads <= 0)
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
  if (n_threads > t) n_threads = t;
  if (n_threads < 1) n_threads = 1;
  std::vector<int> rc(t, 0);
  auto work = [&](int lo, int hi) {
    for (int i = lo; i < hi; ++i)
      rc[i] = process_frame(paths[i], exp_w, exp_h, sw, sh, rects, flips,
                            n_crops, ow, oh, channels,
                            out + static_cast<size_t>(i) * frame_sz,
                            crop_stride, fast);
  };
  if (n_threads == 1) {
    work(0, t);
  } else {
    std::vector<std::thread> pool;
    int per = (t + n_threads - 1) / n_threads;
    for (int k = 0; k < n_threads; ++k) {
      int lo = k * per, hi = lo + per > t ? t : lo + per;
      if (lo < hi) pool.emplace_back(work, lo, hi);
    }
    for (auto& th : pool) th.join();
  }
  for (int i = 0; i < t; ++i)
    if (rc[i] != 0) return rc[i];
  return 0;
}

// Single-image convenience (decode + optional resize, no crop): out must be
// [oh, ow, channels]; pass ow=oh=0 to keep the native size (caller probed).
int ehgr_decode_image(const char* path, int ow, int oh, int channels,
                      unsigned char* out) {
  std::vector<uint8_t> raw;
  int w = 0, h = 0, fw = 0, fh = 0;
  int c = decode_file(path, raw, &w, &h, &fw, &fh);
  if (c < 0) return -1;
  std::vector<uint8_t> conv;
  if (c != channels) {
    if (channels != 1 && channels != 3) return -4;
    conv.resize(static_cast<size_t>(w) * h * channels);
    if (channels == 1)
      rgb_to_gray(raw.data(), conv.data(), static_cast<size_t>(w) * h);
    else
      gray_to_rgb(raw.data(), conv.data(), static_cast<size_t>(w) * h);
    raw.swap(conv);
  }
  if ((ow == 0 && oh == 0) || (ow == w && oh == h)) {
    std::memcpy(out, raw.data(), static_cast<size_t>(w) * h * channels);
    return 0;
  }
  resample(raw.data(), w, h, channels, out, ow, oh);
  return 0;
}

}  // extern "C"
