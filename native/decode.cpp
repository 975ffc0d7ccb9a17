// Native image decode + the decode->letterbox batch loader — the
// darknet data.c role (native threaded image loading feeding the
// compiled graph), built on the system libjpeg/libpng like darknet's
// own image.c (stb fallback there; real libs here).
//
// JPEG via libjpeg (JCS_RGB / JCS_GRAYSCALE output), PNG via libpng's
// simplified API, dispatched on the file's magic bytes. Decode parity
// with cv2 is a CONTRACT (tests/test_native_decode.py): inputs the two
// libraries would normalize differently are DECLINED (return NULL) so
// the cv2 fallback keeps pixels identical whichever decoder is
// selected — JPEGs with an EXIF orientation (cv2.imread auto-rotates,
// libjpeg does not), PNGs with alpha or 16-bit channels (cv2 drops
// alpha and >>8s; libpng's simplified API composites/rescales), and in
// grayscale mode COLOR-source PNGs (cv2 converts with explicit BT.601
// coefficients; the simplified API uses its Rec-709/cHRM defaults).
// Grayscale JPEG decodes natively for ANY source: cv2's own grayscale
// JPEG path is libjpeg JCS_GRAYSCALE, so the conversion is the same
// library code both ways.
//
// decode_letterbox_batch_hwc: N paths -> one (N, net_h, net_w, C)
// float32 letterboxed batch (C = 3 RGB or 1 gray) + per-image source
// dims (for box un-mapping), a worker-thread pool over images,
// letterbox semantics shared with preproc.cpp via letterbox_core.h.
// Python bindings + cv2 fallback: yolo_tpu/native/preproc.py.

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

// EXIF Orientation (tag 0x0112) from the saved APP1 marker; 1 when
// absent/unparseable. Bounds-checked TIFF walk, both byte orders.
int exif_orientation(jpeg_decompress_struct* cinfo) {
    for (jpeg_saved_marker_ptr m = cinfo->marker_list; m; m = m->next) {
        if (m->marker != JPEG_APP0 + 1 || m->data_length < 14) continue;
        const uint8_t* d = m->data;
        if (std::memcmp(d, "Exif\0\0", 6) != 0) continue;
        const uint8_t* t = d + 6;  // TIFF header
        const size_t n = m->data_length - 6;
        bool le;
        if (t[0] == 'I' && t[1] == 'I') le = true;
        else if (t[0] == 'M' && t[1] == 'M') le = false;
        else continue;
        auto u16 = [&](size_t off) -> uint32_t {
            if (off + 2 > n) return 0;
            return le ? (t[off] | t[off + 1] << 8)
                      : (t[off] << 8 | t[off + 1]);
        };
        auto u32 = [&](size_t off) -> uint32_t {
            if (off + 4 > n) return 0;
            return le ? (t[off] | t[off + 1] << 8 | t[off + 2] << 16 |
                         static_cast<uint32_t>(t[off + 3]) << 24)
                      : (static_cast<uint32_t>(t[off]) << 24 |
                         t[off + 1] << 16 | t[off + 2] << 8 | t[off + 3]);
        };
        const uint32_t ifd = u32(4);
        if (ifd == 0 || ifd + 2 > n) continue;
        const uint32_t cnt = u16(ifd);
        for (uint32_t i = 0; i < cnt; ++i) {
            const size_t e = ifd + 2 + static_cast<size_t>(i) * 12;
            if (e + 12 > n) break;
            if (u16(e) == 0x0112) {
                const uint32_t v = u16(e + 8);
                return v ? static_cast<int>(v) : 1;
            }
        }
    }
    return 1;
}

// One JPEG decode body; the source hookup (stdio vs memory) is the
// only difference between the file and byte entry points.
// channels=3 decodes JCS_RGB; channels=1 decodes JCS_GRAYSCALE —
// EXACTLY cv2.IMREAD_GRAYSCALE's path (OpenCV's grfmt_jpeg.cpp sets
// out_color_space = JCS_GRAYSCALE for non-CMYK sources, so the BT.601
// luma conversion happens inside the same libjpeg both here and
// there); CMYK sources fail libjpeg's grayscale conversion and
// decline to the cv2 fallback.
template <typename SetSrc>
uint8_t* decode_jpeg_common(SetSrc set_src, int channels, int* out_h,
                            int* out_w) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_err_exit;
    jerr.pub.emit_message = jpeg_err_silent;
    jerr.pub.output_message = jpeg_err_silent_msg;
    // volatile: assigned between setjmp and a potential longjmp —
    // without it the cleanup free() may see a stale register value
    // and leak the scanline buffer on every corrupt image
    uint8_t* volatile buf = nullptr;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        std::free(buf);
        return nullptr;
    }
    jpeg_create_decompress(&cinfo);
    set_src(&cinfo);
    jpeg_save_markers(&cinfo, JPEG_APP0 + 1, 0xFFFF);
    jpeg_read_header(&cinfo, TRUE);
    if (exif_orientation(&cinfo) != 1) {
        // cv2.imread applies the EXIF rotation; decline rather than
        // silently disagree — the cv2 fallback handles these
        jpeg_destroy_decompress(&cinfo);
        return nullptr;
    }
    cinfo.out_color_space = channels == 1 ? JCS_GRAYSCALE : JCS_RGB;
    jpeg_start_decompress(&cinfo);
    const int w = static_cast<int>(cinfo.output_width);
    const int h = static_cast<int>(cinfo.output_height);
    if (w <= 0 || h <= 0 || cinfo.output_components != channels) {
        jpeg_destroy_decompress(&cinfo);
        return nullptr;
    }
    buf = static_cast<uint8_t*>(
        std::malloc(static_cast<size_t>(w) * h * channels));
    if (!buf) {
        jpeg_destroy_decompress(&cinfo);
        return nullptr;
    }
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = buf +
            static_cast<size_t>(cinfo.output_scanline) * w * channels;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    *out_h = h;
    *out_w = w;
    return buf;
}

// One PNG decode body over the simplified API; the begin_read call is
// the only file-vs-memory difference. channels=1 accepts only
// GRAY-source PNGs (pixel passthrough, byte-identical to cv2):
// COLOR/palette sources decline because libpng's simplified API
// converts RGB->gray with its default (Rec-709/cHRM) coefficients
// while cv2 passes explicit BT.601 ones to png_set_rgb_to_gray —
// same parity-decline discipline as EXIF/alpha/16-bit.
template <typename BeginRead>
uint8_t* decode_png_common(BeginRead begin_read, int channels,
                           int* out_h, int* out_w) {
    png_image image;
    std::memset(&image, 0, sizeof(image));
    image.version = PNG_IMAGE_VERSION;
    if (!begin_read(&image)) return nullptr;
    if ((image.format & PNG_FORMAT_FLAG_ALPHA) ||
        (image.format & PNG_FORMAT_FLAG_LINEAR) ||
        (channels == 1 && (image.format & PNG_FORMAT_FLAG_COLOR))) {
        // alpha: cv2.IMREAD_COLOR drops the channel, libpng's
        // simplified API composites it; 16-bit (LINEAR): cv2 >>8s,
        // libpng rescales; color->gray: coefficient mismatch (header
        // comment) — decline all so pixels stay decoder-independent
        // (cv2 fallback)
        png_image_free(&image);
        return nullptr;
    }
    image.format = channels == 1 ? PNG_FORMAT_GRAY : PNG_FORMAT_RGB;
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

uint8_t* decode_path(const char* path, int channels, int* out_h,
                     int* out_w) {
    if (channels != 1 && channels != 3) return nullptr;
    FILE* f = std::fopen(path, "rb");
    if (!f) return nullptr;
    unsigned char magic[8] = {0};
    const size_t got = std::fread(magic, 1, sizeof(magic), f);
    if (got >= 3 && magic[0] == 0xFF && magic[1] == 0xD8) {
        std::rewind(f);
        uint8_t* buf = decode_jpeg_common(
            [f](jpeg_decompress_struct* c) { jpeg_stdio_src(c, f); },
            channels, out_h, out_w);
        std::fclose(f);
        return buf;
    }
    std::fclose(f);
    if (got >= 8 && std::memcmp(magic, "\x89PNG\r\n\x1a\n", 8) == 0) {
        return decode_png_common(
            [path](png_image* im) {
                return png_image_begin_read_from_file(im, path);
            },
            channels, out_h, out_w);
    }
    return nullptr;  // unknown format — Python falls back to cv2
}

uint8_t* decode_mem(const uint8_t* data, size_t len, int channels,
                    int* out_h, int* out_w) {
    if (!data || len < 8 || (channels != 1 && channels != 3))
        return nullptr;
    if (data[0] == 0xFF && data[1] == 0xD8) {
        return decode_jpeg_common(
            [data, len](jpeg_decompress_struct* c) {
                jpeg_mem_src(c, const_cast<unsigned char*>(data),
                             static_cast<unsigned long>(len));
            },
            channels, out_h, out_w);
    }
    if (std::memcmp(data, "\x89PNG\r\n\x1a\n", 8) == 0) {
        return decode_png_common(
            [data, len](png_image* im) {
                return png_image_begin_read_from_memory(im, data, len);
            },
            channels, out_h, out_w);
    }
    return nullptr;
}

}  // namespace

extern "C" {

// Decode one image to malloc'd uint8 (H*W*channels; channels = 3 RGB
// or 1 grayscale — [net] channels); caller frees with yolo_buf_free.
// Returns NULL on any failure (missing file, bad data, unsupported
// format, or an input the cv2 fallback must handle for parity — see
// the header comment + the per-format gray notes above).
uint8_t* yolo_decode_alloc_c(const char* path, int channels, int* out_h,
                             int* out_w) {
    return decode_path(path, channels, out_h, out_w);
}

// RGB entry point (the original export, kept stable).
uint8_t* yolo_decode_alloc(const char* path, int* out_h, int* out_w) {
    return decode_path(path, 3, out_h, out_w);
}

// In-memory variant (serving: decode uploaded bytes without touching
// disk). Same dispatch and failure contract as the path API.
uint8_t* yolo_decode_mem_c(const uint8_t* data, size_t len,
                           int channels, int* out_h, int* out_w) {
    return decode_mem(data, len, channels, out_h, out_w);
}

uint8_t* yolo_decode_mem(const uint8_t* data, size_t len, int* out_h,
                         int* out_w) {
    return decode_mem(data, len, 3, out_h, out_w);
}

void yolo_buf_free(uint8_t* p) { std::free(p); }

// N paths -> letterboxed float32 batch dst (N, net_h, net_w, channels)
// + dims (N, 2) as (src_h, src_w) per image, for box un-mapping.
// channels = 3 (RGB) or 1 (grayscale, [net] channels=1). ok (N)
// gets 1 per decoded image, 0 per failure (failed slots are gray
// canvases with dims 0,0 — the caller drops or retries them).
// Returns the number of failures.
int decode_letterbox_batch_hwc(const char** paths, int n, int net_h,
                               int net_w, int channels, float* dst,
                               int* dims, uint8_t* ok, int n_threads) {
    if (n <= 0 || net_h <= 0 || net_w <= 0 ||
        (channels != 1 && channels != 3)) return -1;
    const size_t dst_stride =
        static_cast<size_t>(net_h) * net_w * channels;
    std::atomic<int> failures{0};
    int workers = std::max(1, std::min(n_threads, n));
    std::vector<std::thread> pool;
    pool.reserve(workers);
    for (int t = 0; t < workers; ++t) {
        pool.emplace_back([&, t]() {
            for (int i = t; i < n; i += workers) {
                int h = 0, w = 0;
                uint8_t* img = decode_path(paths[i], channels, &h, &w);
                if (!img) {
                    std::fill(dst + i * dst_stride,
                              dst + (i + 1) * dst_stride, 0.5f);
                    dims[2 * i] = dims[2 * i + 1] = 0;
                    ok[i] = 0;
                    failures.fetch_add(1, std::memory_order_relaxed);
                    continue;
                }
                const Geometry g = letterbox_geometry(h, w, net_h,
                                                      net_w);
                const Axis ay = make_axis(h, g.rh);
                const Axis ax = make_axis(w, g.rw);
                yolo_native::letterbox_one_c(
                    img, h, w, dst + i * dst_stride, net_h, net_w,
                    g.rh, g.rw, g.px, g.py, ay, ax, channels);
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

// RGB entry point (the original export, kept stable).
int decode_letterbox_batch_hw(const char** paths, int n, int net_h,
                              int net_w, float* dst, int* dims,
                              uint8_t* ok, int n_threads) {
    return decode_letterbox_batch_hwc(paths, n, net_h, net_w, 3, dst,
                                      dims, ok, n_threads);
}

// Square-canvas entry point (the original export, kept stable).
int decode_letterbox_batch(const char** paths, int n, int net,
                           float* dst, int* dims, uint8_t* ok,
                           int n_threads) {
    return decode_letterbox_batch_hw(paths, n, net, net, dst, dims, ok,
                                     n_threads);
}

}  // extern "C"
