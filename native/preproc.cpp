// Native host-side preprocessing for yolo_tpu (SURVEY.md §2.2: the
// reference delegates image work to TF's C++ runtime; here the host
// data-loader path gets a first-party native kernel).
//
// letterbox_batch: uint8 RGB (B, H, W, 3) -> float32 (B, net, net, 3),
// bilinear resize with half-pixel centers and clamped borders (exactly
// cv2.INTER_LINEAR == ops/letterbox.py == ops/numpy_ref.letterbox),
// normalized to [0,1], gray(0.5)-padded, multithreaded over the batch.
//
// Built by native/Makefile into libyolopreproc.so; loaded via ctypes
// (yolo_tpu/native/preproc.py) with a pure-numpy fallback. The shared
// bilinear/geometry core lives in letterbox_core.h (the decode.cpp
// loader reuses it per image).

#include <algorithm>
#include <cstdint>
#include <thread>
#include <vector>

#include "letterbox_core.h"

using yolo_native::Axis;
using yolo_native::Geometry;
using yolo_native::letterbox_geometry;
using yolo_native::letterbox_one;
using yolo_native::make_axis;

using yolo_native::letterbox_one_c;

extern "C" {

// Channel-generic rectangular-canvas variant: channels = 1 (grayscale,
// [net] channels=1) or 3 (RGB). Returns 0 on success.
int letterbox_batch_hwc(const uint8_t* src, int batch, int src_h,
                        int src_w, int channels, float* dst, int net_h,
                        int net_w, int n_threads) {
    if (batch <= 0 || src_h <= 0 || src_w <= 0 || net_h <= 0 ||
        net_w <= 0 || (channels != 1 && channels != 3)) return 1;
    const Geometry g = letterbox_geometry(src_h, src_w, net_h, net_w);
    const Axis ay = make_axis(src_h, g.rh);
    const Axis ax = make_axis(src_w, g.rw);

    const size_t src_stride =
        static_cast<size_t>(src_h) * src_w * channels;
    const size_t dst_stride =
        static_cast<size_t>(net_h) * net_w * channels;

    int workers = std::max(1, std::min(n_threads, batch));
    std::vector<std::thread> pool;
    pool.reserve(workers);
    for (int t = 0; t < workers; ++t) {
        pool.emplace_back([&, t]() {
            for (int b = t; b < batch; b += workers) {
                letterbox_one_c(src + b * src_stride, src_h, src_w,
                                dst + b * dst_stride, net_h, net_w,
                                g.rh, g.rw, g.px, g.py, ay, ax,
                                channels);
            }
        });
    }
    for (auto& th : pool) th.join();
    return 0;
}

// Rectangular-canvas RGB variant (original export, kept stable).
int letterbox_batch_hw(const uint8_t* src, int batch, int src_h,
                       int src_w, float* dst, int net_h, int net_w,
                       int n_threads) {
    return letterbox_batch_hwc(src, batch, src_h, src_w, 3, dst, net_h,
                               net_w, n_threads);
}

// Square-canvas entry point (the original export, kept stable).
int letterbox_batch(const uint8_t* src, int batch, int src_h, int src_w,
                    float* dst, int net, int n_threads) {
    return letterbox_batch_hw(src, batch, src_h, src_w, dst, net, net,
                              n_threads);
}

}  // extern "C"
