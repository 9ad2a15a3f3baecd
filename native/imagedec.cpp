// Native image decode for the data loader + serving host stage.
//
// The measured host bottleneck on both paths is Python-side image decode
// (serving: 5.3 ms/tile end-to-end on a 1-core host, reports/
// bench_serve_img.json; training: the tar-shard loader's tiles/sec/core is
// decode-dominated). This module decodes PNG (libpng simplified API) and
// JPEG (libjpeg) straight into a caller-provided RGB8 buffer with no
// Python-object or PIL-mode machinery in the loop. Loaded via ctypes from
// spatial_clip_tpu/data/native_decode.py (pure-PIL fallback when absent —
// same convention as the tar indexer, tarindex.cpp).
//
// C ABI (all return 0 on success, negative on failure):
//   sc_image_info(buf, len, *w, *h)       — sniff + header-parse dims
//   sc_decode_rgb(buf, len, out, cap)     — decode to tightly-packed RGB8
#include <cstdint>
#include <cstring>
#include <csetjmp>
#include <cstdio>

#include <png.h>
#include <jpeglib.h>

extern "C" {

static bool is_png(const uint8_t* buf, size_t len) {
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  return len >= 8 && std::memcmp(buf, sig, 8) == 0;
}

static bool is_jpeg(const uint8_t* buf, size_t len) {
  return len >= 3 && buf[0] == 0xFF && buf[1] == 0xD8 && buf[2] == 0xFF;
}

// PIL-parity gate: only the cases whose output is proven byte-identical to
// the PIL fallback are decoded natively; everything else returns -1 so the
// caller falls back to PIL (alpha compositing, 16-bit rescale and CMYK
// conversion differ between the codecs' convenience paths and PIL).
//
// PNG IHDR: sig(8) + len(4) + "IHDR"(4) + w(4) + h(4) + bitdepth@24 +
// colortype@25. Accept bit depth 8, color type 0 (gray) or 2 (RGB).
static bool png_parity_ok(const uint8_t* buf, size_t len) {
  if (len < 26) return false;
  const uint8_t bit_depth = buf[24], color_type = buf[25];
  return bit_depth == 8 && (color_type == 0 || color_type == 2);
}

// JPEG: accept grayscale / YCbCr / RGB source color spaces (CMYK and YCCK
// conversion semantics differ from PIL's).
static bool jpeg_parity_ok(const jpeg_decompress_struct& cinfo) {
  return cinfo.jpeg_color_space == JCS_GRAYSCALE ||
         cinfo.jpeg_color_space == JCS_YCbCr ||
         cinfo.jpeg_color_space == JCS_RGB;
}

// ---------------------------------------------------------------- libjpeg
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

static int jpeg_info(const uint8_t* buf, size_t len, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  if (!jpeg_parity_ok(cinfo)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;  // decline: caller uses PIL
  }
  *w = static_cast<int>(cinfo.image_width);
  *h = static_cast<int>(cinfo.image_height);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

static int jpeg_decode_rgb(const uint8_t* buf, size_t len, uint8_t* out,
                           size_t cap) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  if (!jpeg_parity_ok(cinfo)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;  // decline: caller uses PIL
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const size_t row = static_cast<size_t>(cinfo.output_width) * 3;
  if (cap < row * cinfo.output_height) {
    jpeg_destroy_decompress(&cinfo);
    return -3;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* dst = out + static_cast<size_t>(cinfo.output_scanline) * row;
    jpeg_read_scanlines(&cinfo, &dst, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// ----------------------------------------------------------------- libpng
static int png_info_(const uint8_t* buf, size_t len, int* w, int* h) {
  png_image img;
  std::memset(&img, 0, sizeof img);
  img.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&img, buf, len)) return -2;
  *w = static_cast<int>(img.width);
  *h = static_cast<int>(img.height);
  png_image_free(&img);
  return 0;
}

static int png_decode_rgb(const uint8_t* buf, size_t len, uint8_t* out,
                          size_t cap) {
  png_image img;
  std::memset(&img, 0, sizeof img);
  img.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&img, buf, len)) return -2;
  img.format = PNG_FORMAT_RGB;  // libpng converts gray/palette/alpha
  const size_t need = PNG_IMAGE_SIZE(img);
  if (cap < need) {
    png_image_free(&img);
    return -3;
  }
  if (!png_image_finish_read(&img, nullptr, out, 0, nullptr)) {
    png_image_free(&img);
    return -2;
  }
  return 0;
}

// ------------------------------------------------------------------ C ABI
int sc_image_info(const uint8_t* buf, size_t len, int* w, int* h) {
  if (is_png(buf, len))
    return png_parity_ok(buf, len) ? png_info_(buf, len, w, h) : -1;
  if (is_jpeg(buf, len)) return jpeg_info(buf, len, w, h);
  return -1;  // unknown / non-parity format — caller falls back to PIL
}

int sc_decode_rgb(const uint8_t* buf, size_t len, uint8_t* out, size_t cap) {
  if (is_png(buf, len))
    return png_parity_ok(buf, len) ? png_decode_rgb(buf, len, out, cap) : -1;
  if (is_jpeg(buf, len)) return jpeg_decode_rgb(buf, len, out, cap);
  return -1;
}

}  // extern "C"
