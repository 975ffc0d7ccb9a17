"""YOLO9000 tree-decode benchmark: reference path (dense N x n_nodes
scores) vs the fused tree head (hierarchy on the objectness survivors)
at a synthetic 9k-scale hierarchy — the A/B behind the docs/PERF.md
tree-decode note (measured on-chip; see PERF.md for the numbers).

Usage: python benchmarks/tree_bench.py [--nodes 9418] [--net 544]
       [--batch 32] [--mode traversal|map]
Prints one JSON object with both paths' ms/batch and img/s.
The driver-facing single-line benchmark stays bench.py.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_tree(n_nodes: int, seed: int = 0):
    """A generated hierarchy with 9k-tree-like shape (branching 2-6,
    parents before children, contiguous sibling runs) written to a temp
    file and parsed through the real reader."""
    import tempfile

    from yolo_tpu.configs.tree import parse_tree

    rng = np.random.default_rng(seed)
    parents = [-1]
    frontier = [0]
    while frontier and len(parents) < n_nodes:
        nxt = []
        for node in frontier:
            for _ in range(int(rng.integers(2, 7))):
                if len(parents) >= n_nodes:
                    break
                parents.append(node)
                nxt.append(len(parents) - 1)
        frontier = nxt
    path = os.path.join(tempfile.mkdtemp(), "synth.tree")
    with open(path, "w") as f:
        f.write("".join(f"n{i} {p}\n" for i, p in enumerate(parents)))
    return parse_tree(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=9418)
    ap.add_argument("--net", type=int, default=544)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--anchors", type=int, default=3)
    ap.add_argument("--mode", default="traversal",
                    choices=["traversal", "map"])
    ap.add_argument("--conf", type=float, default=0.3)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the sitecustomize-"
                         "pinned TPU relay ignores JAX_PLATFORMS; this "
                         "must run before first backend use)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from yolo_tpu.ops.decode import decode
    from yolo_tpu.ops.head import detect_head_tree
    from yolo_tpu.ops.nms import nms_batch
    from yolo_tpu.utils.profiling import timeit

    tree = synth_tree(args.nodes)
    c = tree.n_nodes
    s = args.net // 32
    anchors = tuple((1.0 + i, 1.5 + i) for i in range(args.anchors))
    tree_map = (tuple(int(v) for v in
                      np.random.default_rng(1).integers(0, c, 80))
                if args.mode == "map" else None)

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(
        0, 1, (args.batch, s, s, args.anchors * (5 + c))
    ).astype(np.float32))

    @jax.jit
    def reference(t):
        boxes, scores = decode(t, anchors, c, tree=tree,
                               tree_map=tree_map, hier_thresh=0.5)
        return nms_batch(boxes, scores, conf_threshold=args.conf,
                         iou_threshold=0.45, top_k=128,
                         max_detections=100, impl="xla")

    @jax.jit
    def fused(t):
        return detect_head_tree(
            t, anchors, tree, conf_threshold=args.conf,
            iou_threshold=0.45, hier_thresh=0.5, tree_map=tree_map,
            pre_top_k=128, max_detections=100,
            use_pallas=jax.default_backend() == "tpu")

    out = {
        "nodes": c, "depth": tree.max_depth, "net": args.net,
        "batch": args.batch, "mode": args.mode,
        "candidates": s * s * args.anchors,
    }
    # The reference path historically could not run at batch 32 on a
    # 16 GB chip (three successive 19.75 GB allocations: the monolithic
    # pairwise-IoU matrix, a coords-minor candidate gather, and
    # batch-minor tree-softmax layouts). All three are fixed (chunked
    # suppression + deferred box gather in ops/nms.py, 2-D
    # optimization_barrier forms in ops/decode.py tree math); measured
    # b32/544: traversal 536 ms (59.7 img/s), map 182 ms (176 img/s)
    # vs fused 29/37 ms. The OOM catch below is kept as a tripwire —
    # reference_oom:true in the output is now a REGRESSION signal, not
    # the expected verdict (docs/PERF.md tree note).
    try:
        reference(logits)  # compile
        ms_ref = timeit(lambda: reference(logits))
        out["ms_reference"] = round(ms_ref, 3)
        out["img_s_reference"] = round(args.batch / (ms_ref / 1e3), 1)
    except Exception as e:  # XlaRuntimeError: relay surfaces OOM as Internal
        msg = str(e).lower()
        if not any(s in msg for s in
                   ("exceed memory", "resource_exhausted", "out of memory",
                    "ran out of memory", "oom")):
            raise
        out["ms_reference"] = None
        out["reference_oom"] = True

    fused(logits)
    ms_fus = timeit(lambda: fused(logits))
    out["ms_fused"] = round(ms_fus, 3)
    out["img_s_fused"] = round(args.batch / (ms_fus / 1e3), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
