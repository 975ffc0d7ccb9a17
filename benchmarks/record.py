"""Multi-metric perf record with round-to-round tripwires (VERDICT r4
next #3: bench.py guards only the yolov2-coco-416 headline — the
yolov3/tiny/eval-path/tree/train numbers lived as prose tables in
docs/PERF.md with nothing comparing them round to round).

bench.py's one-JSON-line driver contract is untouched. This command
measures the SECONDARY headline numbers and writes a versioned
``benchmarks/record_rNN.json``; each metric is compared against the
newest prior record with the same delta/warning semantics as
bench.regression_fields (numeric round sort, CPU-fallback records
skipped, warning on a drop beyond the threshold — 10% here, above the
relay's measured 5-8% run-to-run variance).

Usage:
  python benchmarks/record.py                 # all metrics -> next record_rNN.json
  python benchmarks/record.py --only yolov3_fused_b128,train_step_b128
  python benchmarks/record.py --compare-only  # re-diff newest record vs its predecessor (no TPU)

Metrics (docs/PERF.md tables carry "recorded by" pointers to these):
  yolov3_fused_b128    yolov3 416 fused head, b128, raw 480x640 RGB, bf16
  tiny_voc_fused_b128  tiny-yolov2-voc 416 fused head, b128, bf16
  eval_exact_nms_b32   yolov2-coco 416 reference head + exact per-class
                       NMS, PR-curve conf 0.005, host-preprocessed, fp32
  tree_map80_eval_b32  ~500-node synth tree trunk, .map 80-leaf
                       projection, reference path (class-chunked exact
                       NMS machinery), fp32
  train_step_b128      yolov2-coco 416 full train step (loss+grads+
                       opt+BN EMA), b128, bf16
"""

import argparse
import glob
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RECORDS_DIR = os.path.dirname(os.path.abspath(__file__))
WARN_DROP = 0.10


# ---------------------------------------------------------------------------
# record bookkeeping + tripwire (pure: unit-tested in
# tests/test_bench_record.py)
# ---------------------------------------------------------------------------

def record_round(path):
    m = re.search(r"record_r(\d+)\.json$", path)
    return int(m.group(1)) if m else -1


def list_records(records_dir):
    """record_rNN.json paths in NUMERIC round order (lexicographic puts
    r100 between r10 and r11 — same pitfall bench.py fixed)."""
    recs = [p for p in glob.glob(os.path.join(records_dir,
                                              "record_r*.json"))
            if record_round(p) >= 0]
    return sorted(recs, key=record_round)


def next_record_path(records_dir):
    recs = list_records(records_dir)
    n = record_round(recs[-1]) + 1 if recs else 1
    return os.path.join(records_dir, f"record_r{n:02d}.json")


def _usable_records(records_dir, before_round=None):
    """(basename, metrics) for every usable prior record, NEWEST
    FIRST — one glob + parse pass shared by all metrics (code-review
    r5: the per-metric walk re-read every file per metric).
    CPU-fallback records are skipped — a TPU number vs a CPU one
    always screams regression."""
    out = []
    for rec in reversed(list_records(records_dir)):
        if before_round is not None and record_round(rec) >= before_round:
            continue
        try:
            d = json.load(open(rec))
            if d.get("backend") == "cpu_fallback_relay_down":
                continue
            out.append((os.path.basename(rec), d.get("metrics", {})))
        except (OSError, ValueError, AttributeError, TypeError):
            continue
    return out


def _newest_value(records, name):
    """PER-METRIC newest prior value from a _usable_records list:
    (value, basename) or (None, None). Per metric — not per record —
    so a `--only` subset run doesn't blind the tripwire for every
    metric it omitted."""
    for base, metrics in records:
        v = metrics.get(name, {}).get("value")
        if v is not None:
            try:
                return float(v), base
            except (TypeError, ValueError):
                continue
    return None, None


def latest_metric_value(records_dir, name, before_round=None):
    """Convenience single-metric form of _newest_value."""
    return _newest_value(_usable_records(records_dir, before_round),
                         name)


def compare_metrics(current, records_dir, before_round=None,
                    warn_drop=WARN_DROP):
    """Merge delta_vs_last/last_record into each metric dict; return a
    list of warning strings for drops beyond warn_drop. Each metric is
    compared against the newest prior record that CARRIES it."""
    warnings = []
    records = _usable_records(records_dir, before_round=before_round)
    for name, m in current.items():
        p, rec = _newest_value(records, name)
        if p is None or p <= 0 or m.get("value") is None:
            continue
        delta = m["value"] / p - 1.0
        m["delta_vs_last"] = round(delta, 4)
        m["last_record"] = rec
        if delta < -warn_drop:
            warnings.append(
                f"PERF REGRESSION [{name}]: {m['value']:.1f} {m['unit']}"
                f" is {-delta * 100:.1f}% below {rec} ({p:.1f})")
    return warnings


# ---------------------------------------------------------------------------
# metric runners (real chip)
# ---------------------------------------------------------------------------

def _throughput(call, out_leaf, batch, iters, warmup):
    # the ONE relay-safe sync recipe (utils/profiling.sync — CLAUDE.md:
    # block_until_ready alone does not wait on the axon relay)
    from yolo_tpu.utils.profiling import sync

    for _ in range(warmup):
        sync(out_leaf(call()))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = call()          # async dispatch pipelines iterations
    sync(out_leaf(out))
    return batch * iters / (time.perf_counter() - t0)


def _detector_metric(variant, batch, *, conf, compute_dtype, head,
                     nms_impl, iters, warmup=2, raw_hw=None,
                     cfg=None, use_tree_map=False):
    import jax
    import jax.numpy as jnp

    from yolo_tpu.configs import get_variant
    from yolo_tpu.io import darknet_weights as dw
    from yolo_tpu.models import graph
    from yolo_tpu.models.predict import (make_detector,
                                         make_detector_preprocessed)

    if cfg is None:
        cfg = get_variant(variant)
    rng = np.random.default_rng(0)
    params = graph.params_to_jax(graph.fold_params(
        cfg.layers, dw.random_params(cfg.layers, rng, scale=0.03),
        cfg.bn_eps))
    dt = getattr(jnp, compute_dtype)
    if raw_hw is not None:
        det = make_detector(cfg, compute_dtype=dt, conf_threshold=conf,
                            head=head, nms_impl=nms_impl,
                            use_tree_map=use_tree_map)
        images = jax.device_put(jnp.asarray(rng.integers(
            0, 256, (batch, *raw_hw, 3), dtype=np.uint8)))
    else:
        det = make_detector_preprocessed(
            cfg, compute_dtype=dt, conf_threshold=conf, head=head,
            nms_impl=nms_impl, use_tree_map=use_tree_map)
        net_h, net_w = cfg.input_hw
        images = jax.device_put(jnp.asarray(rng.uniform(
            0, 1, (batch, net_h, net_w, 3)).astype(np.float32)))
    img_s = _throughput(lambda: det(params, images),
                        lambda o: o["scores"][0, 0], batch, iters,
                        warmup)
    return {"value": round(img_s, 1), "unit": "img/s/chip"}


def m_yolov3_fused_b128():
    return _detector_metric("yolov3", 128, conf=0.5,
                            compute_dtype="bfloat16", head="auto",
                            nms_impl="auto", iters=8,
                            raw_hw=(480, 640))


def m_tiny_voc_fused_b128():
    return _detector_metric("tiny-voc", 128, conf=0.5,
                            compute_dtype="bfloat16", head="auto",
                            nms_impl="auto", iters=20,
                            raw_hw=(480, 640))


def m_eval_exact_nms_b32():
    return _detector_metric("coco", 32, conf=0.005,
                            compute_dtype="float32", head="reference",
                            nms_impl="xla", iters=8)


def m_tree_map80_eval_b32():
    from benchmarks.eval9k_bench import (sample_leaf_map, synth_anchors,
                                         synth_tree)
    from yolo_tpu.configs.specs import ModelConfig
    from yolo_tpu.configs.variants import _yolov2_layers

    tree = synth_tree(500)
    a = 3
    cfg = ModelConfig(name="tree500-record",
                      layers=_yolov2_layers(a * (5 + tree.n_nodes)),
                      anchors=synth_anchors(a), class_names=tree.names,
                      input_size=416, tree=tree, hier_thresh=0.5,
                      tree_map=sample_leaf_map(tree))
    return _detector_metric(None, 32, conf=0.001,
                            compute_dtype="float32", head="reference",
                            nms_impl="xla", iters=6, cfg=cfg,
                            use_tree_map=True)


def m_train_step_b128():
    import jax
    import jax.numpy as jnp

    from yolo_tpu.configs import get_variant
    from yolo_tpu.data import targets as tgt
    from yolo_tpu.io import darknet_weights as dw
    from yolo_tpu.train.loop import TrainConfig, init_state, train_step

    batch, size = 128, 416
    cfg = get_variant("coco")
    rng = np.random.default_rng(0)
    boxes = [np.array([[0.5, 0.5, 0.3, 0.4]]) for _ in range(batch)]
    classes = [np.array([1]) for _ in range(batch)]
    data = {k: jnp.asarray(v) for k, v in tgt.encode_batch(
        boxes, classes, grid=size // 32, anchors=cfg.anchors,
        num_classes=cfg.num_classes).items()}
    data["images"] = jnp.asarray(rng.uniform(
        0, 1, (batch, size, size, 3)).astype(np.float32))
    tcfg = TrainConfig(learning_rate=1e-3)
    state = init_state(dw.random_params(cfg.layers, rng, scale=0.03),
                       tcfg)
    from functools import partial

    step = jax.jit(partial(train_step, mcfg=cfg, tcfg=tcfg,
                           compute_dtype=jnp.bfloat16))

    holder = {"state": state}

    def call():
        s, metrics = step(holder["state"], data)
        holder["state"] = s
        return metrics

    img_s = _throughput(call, lambda m: m["loss"], batch, iters=8,
                        warmup=2)
    return {"value": round(img_s, 1), "unit": "img/s/chip"}


METRICS = {
    "yolov3_fused_b128": m_yolov3_fused_b128,
    "tiny_voc_fused_b128": m_tiny_voc_fused_b128,
    "eval_exact_nms_b32": m_eval_exact_nms_b32,
    "tree_map80_eval_b32": m_tree_map80_eval_b32,
    "train_step_b128": m_train_step_b128,
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", help="comma-separated metric subset")
    ap.add_argument("--records-dir", default=RECORDS_DIR)
    ap.add_argument("--compare-only", action="store_true",
                    help="re-diff the newest record against its "
                         "predecessor; no TPU work")
    args = ap.parse_args(argv)

    if args.compare_only:
        recs = list_records(args.records_dir)
        if not recs:
            print(json.dumps({"error": "no records"}))
            return
        d = json.load(open(recs[-1]))
        warnings = compare_metrics(d["metrics"], args.records_dir,
                                   before_round=record_round(recs[-1]))
        for w in warnings:
            print(w, file=sys.stderr)
        print(json.dumps(d, indent=1))
        return

    names = (args.only.split(",") if args.only else list(METRICS))
    unknown = [n for n in names if n not in METRICS]
    if unknown:
        # fail BEFORE the (up to 2x150s) relay liveness probe
        ap.error(f"unknown metric(s) {','.join(unknown)} — valid: "
                 f"{','.join(METRICS)}")

    from bench import _backend_alive  # repo root on sys.path (top)

    backend = "tpu"
    if not _backend_alive():
        print("relay down: recording nothing (secondary metrics are "
              "only meaningful on the real chip)", file=sys.stderr)
        backend = "cpu_fallback_relay_down"
    metrics = {}
    if backend == "tpu":
        for name in names:
            t0 = time.perf_counter()
            metrics[name] = METRICS[name]()
            metrics[name]["wall_s"] = round(time.perf_counter() - t0, 1)
            print(f"  {name}: {metrics[name]['value']} "
                  f"{metrics[name]['unit']}", file=sys.stderr)
    out_path = next_record_path(args.records_dir)
    warnings = compare_metrics(metrics, args.records_dir)
    rec = {"round": record_round(out_path), "backend": backend,
           "metrics": metrics, "warnings": warnings,
           "recorded_at": time.strftime("%Y-%m-%d %H:%M:%S")}
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    for w in warnings:
        print(w, file=sys.stderr)
    print(json.dumps({"record": os.path.basename(out_path),
                      "backend": backend,
                      "metrics": {k: v["value"]
                                  for k, v in metrics.items()},
                      "warnings": len(warnings)}))


if __name__ == "__main__":
    main()
