// Shared letterbox core for the native host-side kernels
// (preproc.cpp batch letterbox, decode.cpp decode->letterbox loader).
// Semantics are pinned to ops/numpy_ref.letterbox == cv2.INTER_LINEAR:
// bilinear with half-pixel centers, clamped borders, gray(0.5) pad,
// [0,1] normalization; geometry uses half-to-even rounding to match
// Python round() (see letterbox_batch note in preproc.cpp history).
#pragma once

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace yolo_native {

struct Axis {
    std::vector<int> i0, i1;
    std::vector<float> w1;  // weight of i1; weight of i0 = 1 - w1
};

inline Axis make_axis(int in_size, int out_size) {
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

struct Geometry {
    int rw, rh, px, py;
};

// Rectangular canvas ([net] width != height): scale = min over both
// axes, pad centered per axis — matches ops/letterbox.letterbox_geometry.
inline Geometry letterbox_geometry(int src_h, int src_w, int net_h,
                                   int net_w) {
    const double scale =
        std::min(static_cast<double>(net_w) / src_w,
                 static_cast<double>(net_h) / src_h);
    // half-to-even to match Python round() in letterbox_geometry —
    // std::lround is half-away-from-zero and disagrees on exact .5
    // products (e.g. 417x832 at net 416: 208.5 -> 208 vs 209)
    Geometry g;
    g.rw = static_cast<int>(std::nearbyint(src_w * scale));
    g.rh = static_cast<int>(std::nearbyint(src_h * scale));
    g.px = (net_w - g.rw) / 2;
    g.py = (net_h - g.rh) / 2;
    return g;
}

inline Geometry letterbox_geometry(int src_h, int src_w, int net) {
    return letterbox_geometry(src_h, src_w, net, net);
}

// Channel-generic core: C is a compile-time constant (1 = grayscale,
// 3 = RGB) so the inner loop stays unrolled.
template <int C>
inline void letterbox_one_t(const uint8_t* src, int src_h, int src_w,
                            float* dst, int net_h, int net_w, int rh,
                            int rw, int px, int py, const Axis& ay,
                            const Axis& ax) {
    (void)src_h;  // rows are addressed through the clamped axis table
    // fill canvas with gray 0.5
    std::fill(dst, dst + static_cast<size_t>(net_h) * net_w * C, 0.5f);
    // row-interpolated scratch: two source rows blended -> (rw, C)
    std::vector<float> row(static_cast<size_t>(rw) * C);
    const float inv255 = 1.0f / 255.0f;
    for (int oy = 0; oy < rh; ++oy) {
        const uint8_t* r0 = src + static_cast<size_t>(ay.i0[oy]) * src_w * C;
        const uint8_t* r1 = src + static_cast<size_t>(ay.i1[oy]) * src_w * C;
        const float wy = ay.w1[oy];
        for (int ox = 0; ox < rw; ++ox) {
            const float wx = ax.w1[ox];
            const int x0 = ax.i0[ox] * C, x1 = ax.i1[ox] * C;
            for (int ch = 0; ch < C; ++ch) {
                const float top = r0[x0 + ch] + wx * (r0[x1 + ch] - r0[x0 + ch]);
                const float bot = r1[x0 + ch] + wx * (r1[x1 + ch] - r1[x0 + ch]);
                row[ox * C + ch] = (top + wy * (bot - top)) * inv255;
            }
        }
        float* out = dst + (static_cast<size_t>(py + oy) * net_w + px) * C;
        std::memcpy(out, row.data(), row.size() * sizeof(float));
    }
}

// Runtime-channel dispatch (1 or 3; anything else is a caller bug the
// exported entry points reject before reaching here).
inline void letterbox_one_c(const uint8_t* src, int src_h, int src_w,
                            float* dst, int net_h, int net_w, int rh,
                            int rw, int px, int py, const Axis& ay,
                            const Axis& ax, int channels) {
    if (channels == 1) {
        letterbox_one_t<1>(src, src_h, src_w, dst, net_h, net_w, rh, rw,
                           px, py, ay, ax);
    } else {
        letterbox_one_t<3>(src, src_h, src_w, dst, net_h, net_w, rh, rw,
                           px, py, ay, ax);
    }
}

// RGB entry point (the original signature, kept for the callers).
inline void letterbox_one(const uint8_t* src, int src_h, int src_w,
                          float* dst, int net_h, int net_w, int rh,
                          int rw, int px, int py, const Axis& ay,
                          const Axis& ax) {
    letterbox_one_t<3>(src, src_h, src_w, dst, net_h, net_w, rh, rw,
                       px, py, ay, ax);
}

}  // namespace yolo_native
