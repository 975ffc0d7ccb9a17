// Native image decode + the decode->letterbox batch loader — the
// darknet data.c role (native threaded image loading feeding the
// compiled graph), built on the system libjpeg/libpng like darknet's
// own image.c (stb fallback there; real libs here).
//
// JPEG via libjpeg (JCS_RGB output), PNG via libpng's simplified API
// (PNG_FORMAT_RGB: palette/gray/16-bit/alpha all normalized to 8-bit
// RGB), dispatched on the file's magic bytes.
//
// decode_letterbox_batch: N paths -> one (N, net, net, 3) float32
// letterboxed batch + per-image source dims (for box un-mapping), a
// worker-thread pool over images, letterbox semantics shared with
// preproc.cpp via letterbox_core.h. Python bindings + cv2 fallback:
// yolo_tpu/native/preproc.py.

#include <atomic>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

#include "letterbox_core.h"

using yolo_native::Axis;
using yolo_native::Geometry;
using yolo_native::letterbox_geometry;
using yolo_native::letterbox_one;
using yolo_native::make_axis;

namespace {

struct JpegErr {
    jpeg_error_mgr pub;
    jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jb, 1);
}

void jpeg_err_silent(j_common_ptr, int) {}
void jpeg_err_silent_msg(j_common_ptr) {}

uint8_t* decode_jpeg(FILE* f, int* out_h, int* out_w) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_err_exit;
    jerr.pub.emit_message = jpeg_err_silent;
    jerr.pub.output_message = jpeg_err_silent_msg;
    uint8_t* buf = nullptr;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        std::free(buf);
        return nullptr;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    const int w = static_cast<int>(cinfo.output_width);
    const int h = static_cast<int>(cinfo.output_height);
    if (w <= 0 || h <= 0 || cinfo.output_components != 3) {
        jpeg_destroy_decompress(&cinfo);
        return nullptr;
    }
    buf = static_cast<uint8_t*>(
        std::malloc(static_cast<size_t>(w) * h * 3));
    if (!buf) {
        jpeg_destroy_decompress(&cinfo);
        return nullptr;
    }
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = buf + static_cast<size_t>(cinfo.output_scanline) * w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    *out_h = h;
    *out_w = w;
    return buf;
}

uint8_t* decode_png(const char* path, int* out_h, int* out_w) {
    png_image image;
    std::memset(&image, 0, sizeof(image));
    image.version = PNG_IMAGE_VERSION;
    if (!png_image_begin_read_from_file(&image, path)) return nullptr;
    image.format = PNG_FORMAT_RGB;
    const size_t size = PNG_IMAGE_SIZE(image);
    uint8_t* buf = static_cast<uint8_t*>(std::malloc(size));
    if (!buf) {
        png_image_free(&image);
        return nullptr;
    }
    if (!png_image_finish_read(&image, nullptr, buf, 0, nullptr)) {
        png_image_free(&image);
        std::free(buf);
        return nullptr;
    }
    *out_h = static_cast<int>(image.height);
    *out_w = static_cast<int>(image.width);
    return buf;
}

uint8_t* decode_jpeg_mem(const uint8_t* data, size_t len, int* out_h,
                         int* out_w) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_err_exit;
    jerr.pub.emit_message = jpeg_err_silent;
    jerr.pub.output_message = jpeg_err_silent_msg;
    uint8_t* buf = nullptr;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        std::free(buf);
        return nullptr;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
                 static_cast<unsigned long>(len));
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    const int w = static_cast<int>(cinfo.output_width);
    const int h = static_cast<int>(cinfo.output_height);
    if (w <= 0 || h <= 0 || cinfo.output_components != 3) {
        jpeg_destroy_decompress(&cinfo);
        return nullptr;
    }
    buf = static_cast<uint8_t*>(
        std::malloc(static_cast<size_t>(w) * h * 3));
    if (!buf) {
        jpeg_destroy_decompress(&cinfo);
        return nullptr;
    }
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = buf + static_cast<size_t>(cinfo.output_scanline) * w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    *out_h = h;
    *out_w = w;
    return buf;
}

uint8_t* decode_png_mem(const uint8_t* data, size_t len, int* out_h,
                        int* out_w) {
    png_image image;
    std::memset(&image, 0, sizeof(image));
    image.version = PNG_IMAGE_VERSION;
    if (!png_image_begin_read_from_memory(&image, data, len))
        return nullptr;
    image.format = PNG_FORMAT_RGB;
    uint8_t* buf = static_cast<uint8_t*>(std::malloc(PNG_IMAGE_SIZE(image)));
    if (!buf) {
        png_image_free(&image);
        return nullptr;
    }
    if (!png_image_finish_read(&image, nullptr, buf, 0, nullptr)) {
        png_image_free(&image);
        std::free(buf);
        return nullptr;
    }
    *out_h = static_cast<int>(image.height);
    *out_w = static_cast<int>(image.width);
    return buf;
}

uint8_t* decode_path(const char* path, int* out_h, int* out_w) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return nullptr;
    unsigned char magic[8] = {0};
    const size_t got = std::fread(magic, 1, sizeof(magic), f);
    uint8_t* buf = nullptr;
    if (got >= 3 && magic[0] == 0xFF && magic[1] == 0xD8) {
        std::rewind(f);
        buf = decode_jpeg(f, out_h, out_w);
        std::fclose(f);
        return buf;
    }
    std::fclose(f);
    if (got >= 8 && std::memcmp(magic, "\x89PNG\r\n\x1a\n", 8) == 0) {
        return decode_png(path, out_h, out_w);
    }
    return nullptr;  // unknown format — Python falls back to cv2
}

}  // namespace

extern "C" {

// Decode one image to malloc'd RGB uint8 (H*W*3); caller frees with
// yolo_buf_free. Returns NULL on any failure (missing file, bad data,
// unsupported format).
uint8_t* yolo_decode_alloc(const char* path, int* out_h, int* out_w) {
    return decode_path(path, out_h, out_w);
}

// In-memory variant (serving: decode uploaded bytes without touching
// disk). Same magic dispatch and failure contract as the path API.
uint8_t* yolo_decode_mem(const uint8_t* data, size_t len, int* out_h,
                         int* out_w) {
    if (!data || len < 8) return nullptr;
    if (data[0] == 0xFF && data[1] == 0xD8)
        return decode_jpeg_mem(data, len, out_h, out_w);
    if (std::memcmp(data, "\x89PNG\r\n\x1a\n", 8) == 0)
        return decode_png_mem(data, len, out_h, out_w);
    return nullptr;
}

void yolo_buf_free(uint8_t* p) { std::free(p); }

// N paths -> letterboxed float32 batch dst (N, net, net, 3) + dims
// (N, 2) as (src_h, src_w) per image, for box un-mapping. ok (N)
// gets 1 per decoded image, 0 per failure (failed slots are gray
// canvases with dims 0,0 — the caller drops or retries them).
// Returns the number of failures.
int decode_letterbox_batch(const char** paths, int n, int net,
                           float* dst, int* dims, uint8_t* ok,
                           int n_threads) {
    if (n <= 0 || net <= 0) return -1;
    const size_t dst_stride = static_cast<size_t>(net) * net * 3;
    std::atomic<int> failures{0};
    int workers = std::max(1, std::min(n_threads, n));
    std::vector<std::thread> pool;
    pool.reserve(workers);
    for (int t = 0; t < workers; ++t) {
        pool.emplace_back([&, t]() {
            for (int i = t; i < n; i += workers) {
                int h = 0, w = 0;
                uint8_t* img = decode_path(paths[i], &h, &w);
                if (!img) {
                    std::fill(dst + i * dst_stride,
                              dst + (i + 1) * dst_stride, 0.5f);
                    dims[2 * i] = dims[2 * i + 1] = 0;
                    ok[i] = 0;
                    failures.fetch_add(1, std::memory_order_relaxed);
                    continue;
                }
                const Geometry g = letterbox_geometry(h, w, net);
                const Axis ay = make_axis(h, g.rh);
                const Axis ax = make_axis(w, g.rw);
                letterbox_one(img, h, w, dst + i * dst_stride, net,
                              g.rh, g.rw, g.px, g.py, ay, ax);
                std::free(img);
                dims[2 * i] = h;
                dims[2 * i + 1] = w;
                ok[i] = 1;
            }
        });
    }
    for (auto& th : pool) th.join();
    return failures.load();
}

}  // extern "C"
