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
// (yolo_tpu/native/preproc.py) with a pure-numpy fallback.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Axis {
    std::vector<int> i0, i1;
    std::vector<float> w1;  // weight of i1; weight of i0 = 1 - w1
};

Axis make_axis(int in_size, int out_size) {
    Axis ax;
    ax.i0.resize(out_size);
    ax.i1.resize(out_size);
    ax.w1.resize(out_size);
    const double scale = static_cast<double>(in_size) / out_size;
    for (int o = 0; o < out_size; ++o) {
        double c = (o + 0.5) * scale - 0.5;
        double f = std::floor(c);
        double frac = c - f;
        int i0 = static_cast<int>(f);
        int i1 = i0 + 1;
        ax.i0[o] = std::clamp(i0, 0, in_size - 1);
        ax.i1[o] = std::clamp(i1, 0, in_size - 1);
        ax.w1[o] = static_cast<float>(frac);
    }
    return ax;
}

void letterbox_one(const uint8_t* src, int src_h, int src_w, float* dst,
                   int net, int rh, int rw, int px, int py,
                   const Axis& ay, const Axis& ax) {
    // fill canvas with gray 0.5
    std::fill(dst, dst + static_cast<size_t>(net) * net * 3, 0.5f);
    // row-interpolated scratch: two source rows blended -> (rw, 3)
    std::vector<float> row(static_cast<size_t>(rw) * 3);
    const float inv255 = 1.0f / 255.0f;
    for (int oy = 0; oy < rh; ++oy) {
        const uint8_t* r0 = src + static_cast<size_t>(ay.i0[oy]) * src_w * 3;
        const uint8_t* r1 = src + static_cast<size_t>(ay.i1[oy]) * src_w * 3;
        const float wy = ay.w1[oy];
        for (int ox = 0; ox < rw; ++ox) {
            const float wx = ax.w1[ox];
            const int x0 = ax.i0[ox] * 3, x1 = ax.i1[ox] * 3;
            for (int ch = 0; ch < 3; ++ch) {
                const float top = r0[x0 + ch] + wx * (r0[x1 + ch] - r0[x0 + ch]);
                const float bot = r1[x0 + ch] + wx * (r1[x1 + ch] - r1[x0 + ch]);
                row[ox * 3 + ch] = (top + wy * (bot - top)) * inv255;
            }
        }
        float* out = dst + (static_cast<size_t>(py + oy) * net + px) * 3;
        std::memcpy(out, row.data(), row.size() * sizeof(float));
    }
}

}  // namespace

extern "C" {

// Returns 0 on success. Geometry matches ops/letterbox.letterbox_geometry.
int letterbox_batch(const uint8_t* src, int batch, int src_h, int src_w,
                    float* dst, int net, int n_threads) {
    if (batch <= 0 || src_h <= 0 || src_w <= 0 || net <= 0) return 1;
    const double scale =
        std::min(static_cast<double>(net) / src_w,
                 static_cast<double>(net) / src_h);
    // half-to-even to match Python round() in letterbox_geometry —
    // std::lround is half-away-from-zero and disagrees on exact .5
    // products (e.g. 417x832 at net 416: 208.5 -> 208 vs 209)
    const int rw = static_cast<int>(std::nearbyint(src_w * scale));
    const int rh = static_cast<int>(std::nearbyint(src_h * scale));
    const int px = (net - rw) / 2, py = (net - rh) / 2;
    const Axis ay = make_axis(src_h, rh);
    const Axis ax = make_axis(src_w, rw);

    const size_t src_stride = static_cast<size_t>(src_h) * src_w * 3;
    const size_t dst_stride = static_cast<size_t>(net) * net * 3;

    int workers = std::max(1, std::min(n_threads, batch));
    std::vector<std::thread> pool;
    pool.reserve(workers);
    for (int t = 0; t < workers; ++t) {
        pool.emplace_back([&, t]() {
            for (int b = t; b < batch; b += workers) {
                letterbox_one(src + b * src_stride, src_h, src_w,
                              dst + b * dst_stride, net, rh, rw, px, py,
                              ay, ax);
            }
        });
    }
    for (auto& th : pool) th.join();
    return 0;
}

}  // extern "C"
