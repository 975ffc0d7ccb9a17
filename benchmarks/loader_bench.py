"""Host data-loader micro-benchmark: cv2-per-image Python path vs the
fused native decode->letterbox batch loader (native/decode.cpp).

Both decode the same JPEG/PNG set and produce identical letterboxed
batches (tests/test_native_decode.py pins equality); this measures the
per-image Python dispatch overhead the fused C++ call removes. On the
1-core dev box thread scaling is invisible — the interesting number
there is per-image overhead; on a real host, pass --threads.

Usage: python benchmarks/loader_bench.py [--n 200] [--net 416]
       [--threads 4] [--ext jpg|png]
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--net", type=int, default=416)
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--ext", default="jpg", choices=["jpg", "png"])
    ap.add_argument("--size", default="480x640",
                    help="HxW of the synthetic images")
    args = ap.parse_args()

    import cv2

    from yolo_tpu.native import preproc
    from yolo_tpu.ops import numpy_ref as npr

    h, w = (int(v) for v in args.size.split("x"))
    rng = np.random.default_rng(0)
    d = tempfile.mkdtemp(prefix="loader_bench_")
    paths = []
    for i in range(args.n):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        p = f"{d}/img{i}.{args.ext}"
        cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        paths.append(p)

    def bench(fn, label):
        fn()  # warm (page cache, lib init)
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        print(f"{label:34s} {args.n / dt:8.1f} img/s "
              f"({dt / args.n * 1e3:6.2f} ms/img)")
        return args.n / dt

    def python_path():
        for p in paths:
            img = cv2.cvtColor(cv2.imread(p, cv2.IMREAD_COLOR),
                               cv2.COLOR_BGR2RGB)
            npr.letterbox(img, args.net, args.net)

    def python_native_letterbox():
        for p in paths:
            img = cv2.cvtColor(cv2.imread(p, cv2.IMREAD_COLOR),
                               cv2.COLOR_BGR2RGB)
            preproc.letterbox_batch(img[None], args.net, n_threads=1)

    def fused_native():
        out, dims, ok = preproc.decode_letterbox_batch(
            paths, args.net, n_threads=args.threads)
        assert ok.all()

    assert preproc.available(), "native library unavailable"
    a = bench(python_path, "cv2 decode + numpy/cv2 letterbox")
    b = bench(python_native_letterbox, "cv2 decode + native letterbox")
    c = bench(fused_native,
              f"fused native loader ({args.threads} thr)")
    print(f"fused vs python path: {c / a:.2f}x")


if __name__ == "__main__":
    main()
