"""Dual-stack VOC mAP parity proxy (BASELINE.json:2 'VOC mAP parity').

Real weights / real VOC are unavailable offline (SURVEY.md §0), so the
strongest offline evidence for the accuracy north star is END-TO-END
protocol agreement between two independent stacks over a synthetic
VOC-style dataset:

  JAX stack (production): eval.runner.collect_detections — native/host
    letterbox, jitted forward, reference decode + per-class NMS on
    device, unletterbox — scored by eval.voc_map.evaluate.
  TF stack (oracle): numpy_ref letterbox -> tests/tf_oracle.run_layers
    (TensorFlow forward) -> numpy_ref loop decode -> a loop-level
    protocol mirror of the per-class NMS (top-128 per-class candidate
    cap, greedy suppression, global 100-detection cap) -> scored by a
    clean-room 11-point VOC evaluator written HERE (devkit +1 IoU).

Asserting the two mAPs match to float tolerance localizes protocol
drift (decode vs NMS vs eval) without real data: hundreds of
detections per run make any convention mismatch (pixel inclusivity,
tie-breaks, candidate caps, greedy order) move the number.

Ground truth is synthesized from the model's own high-confidence
detections (jittered) plus random distractor boxes, so the PR curves
are non-degenerate (mAP well away from both 0 and 1).

Round-4 widening (the surfaces where protocol drift would hide):
the FULL yolov2-coco region+reorg path, stretch (letter_box=0)
geometry, a rectangular 416x256 net, and a clean-room COCO
mAP@[.5:.95] scorer cross-checked against eval/coco_map.evaluate_coco
on the same synthetic set. Each failure localizes: stack drift moves
the jax-vs-tf number; evaluator drift moves the same-set cross-score.

Round-4 continuation: the remaining HEAD FAMILIES now ride the same
end-to-end gate — [Gaussian_yolo] (interleaved 9+C layout, uc_aver
score factor), scaled-yolov4 [yolo] new_coords=1 + scale_x_y
(logistic head convs, (2v)^2 wh), yolov1 [detection] (flat CHW
layout, sqrt wh, conf*prob scores through [crop]/[local]/[connected]
trunks), and YOLO9000 [region] tree traversal scoring (greedy descent
under hier_thresh) — every decode family the framework ships is now
covered by a two-stack mAP agreement, not just layer/decode unit
parity.
"""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

pytestmark = pytest.mark.slow

N_IMAGES = int(os.environ.get("DUAL_STACK_IMAGES", 100))
EVAL_CONF = 0.05


def _realistic_params(cfg, rng):
    """Fan-in-scaled random weights (He-style) with near-identity BN:
    activations stay unit-scale through the full-depth trunk, so the
    head emits spread-but-sane logits — confidences span (0, 1) and
    boxes stay finite, unlike flat-scale noise which explodes through
    1024-channel layers (conf saturates at 1.0, exp(tw) overflows)."""
    from yolo_tpu.io import darknet_weights as dw

    params = dw.random_params(cfg.layers, rng, scale=0.05)
    for p in params:
        if "kernel" not in p:
            continue
        k = p["kernel"]
        fan_in = int(np.prod(k.shape[:-1]))
        p["kernel"] = rng.normal(
            0, 1.4 / np.sqrt(fan_in), k.shape).astype(np.float32)
        if "gamma" in p:
            p["gamma"] = rng.uniform(0.9, 1.1, p["gamma"].shape
                                     ).astype(np.float32)
            p["beta"] = rng.normal(0, 0.1, p["beta"].shape
                                   ).astype(np.float32)
            p["mean"] = rng.normal(0, 0.05, p["mean"].shape
                                   ).astype(np.float32)
            p["var"] = rng.uniform(0.9, 1.1, p["var"].shape
                                   ).astype(np.float32)
        elif "bias" in p:
            p["bias"] = rng.normal(0, 0.3, p["bias"].shape
                                   ).astype(np.float32)
    return params


def _make_images(tmp_path, rng, n=N_IMAGES):
    import cv2

    paths = []
    for i in range(n):
        h = int(rng.integers(160, 480))
        w = int(rng.integers(160, 480))
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        # paint a few rectangles so activations aren't pure noise
        for _ in range(3):
            x1, y1 = int(rng.integers(0, w - 20)), int(rng.integers(0, h - 20))
            x2 = int(rng.integers(x1 + 10, min(x1 + w // 2, w)))
            y2 = int(rng.integers(y1 + 10, min(y1 + h // 2, h)))
            img[y1:y2, x1:x2] = rng.integers(0, 255, 3)
        p = str(tmp_path / f"img_{i:03d}.png")
        cv2.imwrite(p, img[..., ::-1])  # cv2 writes BGR
        paths.append((p, (h, w)))
    return paths


# ---------------------------------------------------------------------------
# the TF stack: oracle letterbox -> TF forward -> loop decode ->
# protocol-mirror per-class NMS -> unletterbox
# ---------------------------------------------------------------------------

def _protocol_nms(boxes, scores, conf, iou, *, top_k=128, max_det=100):
    """Loop-level mirror of ops/nms.nms_batch(impl='xla') + _package:
    per class, the top-``top_k`` candidates by (score desc, index asc)
    enter greedy suppression (kept only at >= conf); the kept set is
    then globally capped at ``max_det`` by score. Independent
    derivation for the dual-stack proxy."""
    from yolo_tpu.ops.numpy_ref import iou_xywh

    n, c = scores.shape
    out = []
    for cls in range(c):
        s = scores[:, cls]
        order = np.lexsort((np.arange(n), -s))[:top_k]
        suppressed = np.zeros(n, dtype=bool)
        for oi, i in enumerate(order):
            if s[i] < conf or suppressed[i]:
                continue
            out.append((boxes[i], float(s[i]), cls))
            for j in order[oi + 1:]:
                if not suppressed[j] and iou_xywh(boxes[i],
                                                  boxes[j]) > iou:
                    suppressed[j] = True
    out.sort(key=lambda r: -r[1])
    return out[:max_det]


def _tf_collect(cfg, params, samples, eval_conf, resize="letterbox",
                use_tree_map=False, nms_fn=None, zero_pad_origin=False,
                swap_stretch_axes=False):
    """{img_id: [(cls, score, x1, y1, x2, y2) source pixels]} through
    the TF stack only — oracle letterbox OR stretch geometry.

    nms_fn / zero_pad_origin are MUTATION hooks for the sensitivity
    canaries only: an alternate protocol-NMS, and an unmap that drops
    the centered pad origin (px=py=0)."""
    import tests.tf_oracle as tfo
    from yolo_tpu.data.pipeline import load_image_rgb
    from yolo_tpu.ops import numpy_ref as npr
    from yolo_tpu.ops.letterbox import letterbox_geometry

    net_h, net_w = cfg.input_hw
    masks = [h.mask for h in cfg.yolo_heads]
    dets = {}
    for img_id, (path, (src_h, src_w)) in enumerate(samples):
        img = load_image_rgb(path)
        if resize == "stretch":
            x = npr.stretch_resize(img, net_w, net_h)
        else:
            x = npr.letterbox(img, net_w, net_h)[0]
        logits = tfo.run_layers(cfg.layers, params, x[None],
                                eps=cfg.bn_eps)
        if cfg.head_kind == "yolo":
            heads = cfg.yolo_heads
            boxes, scores = npr.decode_yolo(
                [np.asarray(l)[0] for l in logits], cfg.anchors, masks,
                cfg.num_classes, cfg.input_hw,
                scales=[h.scale_xy for h in heads],
                new_coords=[h.new_coords for h in heads],
                gaussian=[h.gaussian for h in heads])
        elif cfg.head_kind == "detection":
            dh = cfg.detection_head
            boxes, scores = npr.decode_detection(
                np.asarray(logits).reshape(-1), dh.side, dh.num,
                dh.classes, sqrt=dh.sqrt, coords=dh.coords)
        elif cfg.tree is not None:
            # YOLO9000: traversal scoring (darknet detector default)
            # or the .map COCO-projection (use_tree_map)
            boxes, scores = npr.decode_tree(
                np.asarray(logits)[0], cfg.anchors, cfg.tree,
                cfg.hier_thresh,
                tree_map=cfg.tree_map if use_tree_map else None)
        else:
            boxes, scores = npr.decode(np.asarray(logits)[0],
                                       cfg.anchors, cfg.num_classes)
        kept = (nms_fn or _protocol_nms)(
            np.asarray(boxes), np.asarray(scores), eval_conf,
            cfg.nms_threshold)
        if not kept:
            dets[img_id] = []
            continue
        kb = np.stack([k[0] for k in kept])
        if resize == "stretch":
            if swap_stretch_axes:
                xyxy = npr.unstretch_boxes(kb, src_h, src_w)
            else:
                xyxy = npr.unstretch_boxes(kb, src_w, src_h)
        else:
            scale, rh, rw, px, py = letterbox_geometry(src_h, src_w,
                                                       (net_h, net_w))
            if zero_pad_origin:
                px = py = 0
            xyxy = npr.unletterbox_boxes(kb, scale, px, py, net_w,
                                         net_h, src_w, src_h)
        dets[img_id] = [(k[2], k[1], *xyxy[j])
                        for j, k in enumerate(kept)]
    return dets


# ---------------------------------------------------------------------------
# clean-room 11-point VOC evaluator (devkit +1 IoU) — the TF stack's
# own scorer, written loop-level and independently of eval/voc_map.py
# ---------------------------------------------------------------------------

def _iou_voc(a, b):
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    iw, ih = max(ix2 - ix1 + 1.0, 0.0), max(iy2 - iy1 + 1.0, 0.0)
    inter = iw * ih
    ua = ((a[2] - a[0] + 1.0) * (a[3] - a[1] + 1.0)
          + (b[2] - b[0] + 1.0) * (b[3] - b[1] + 1.0) - inter)
    return inter / ua if ua > 0 else 0.0


def _voc_map_oracle(detections, ground_truth, num_classes):
    aps = []
    for cls in range(num_classes):
        recs = []
        for img_id, dets in detections.items():
            for d in dets:
                if d[0] == cls:
                    recs.append((img_id, d[1], d[2:6]))
        recs.sort(key=lambda r: -r[1])
        matched = {i: [False] * int((np.asarray(g["classes"]) == cls).sum())
                   for i, g in ground_truth.items()}
        npos = sum(int((np.asarray(g["classes"]) == cls).sum())
                   for g in ground_truth.values())
        if npos == 0:
            continue
        tps, fps = [], []
        for img_id, _s, box in recs:
            g = ground_truth[img_id]
            sel = np.asarray(g["classes"]) == cls
            gboxes = np.asarray(g["boxes"])[sel]
            best, bj = 0.0, -1
            for j, gb in enumerate(gboxes):
                v = _iou_voc(box, gb)
                if v > best:
                    best, bj = v, j
            if best >= 0.5 and not matched[img_id][bj]:
                matched[img_id][bj] = True
                tps.append(1.0); fps.append(0.0)
            else:
                tps.append(0.0); fps.append(1.0)
        tp = np.cumsum(tps)
        fp = np.cumsum(fps)
        rec = tp / npos
        prec = tp / np.maximum(tp + fp, 1e-12)
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            above = prec[rec >= t]
            ap += (above.max() if above.size else 0.0) / 11.0
        aps.append(ap)
    return float(np.mean(aps)) if aps else 0.0


# ---------------------------------------------------------------------------
# clean-room COCO-protocol scorer (mAP@[.5:.95]) — a second, loop-level
# derivation of the pycocotools bbox protocol, independent of
# eval/coco_map.py, for the 'all' area range with no crowd/ignored GT
# (the synthetic GT carries neither). Protocol surface covered: the
# per-image PER-CLASS top-max_dets cap, score-descending greedy
# matching with >=-upgrade (a later GT with equal-or-better IoU takes
# the match), continuous IoU, the global stable score merge, 101-point
# interpolated AP, mean over the 10-threshold grid then over classes
# that have GT.
# ---------------------------------------------------------------------------

def _iou_cont(a, b):
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(ix2 - ix1, 0.0) * max(iy2 - iy1, 0.0)
    ua = ((a[2] - a[0]) * (a[3] - a[1])
          + (b[2] - b[0]) * (b[3] - b[1]) - inter)
    return inter / ua if ua > 0 else 0.0


def _coco_map_oracle(detections, ground_truth, num_classes,
                     max_dets=100):
    """Returns {'map', 'ar'} — AP@[.5:.95] and AR@max_dets (the
    final-recall mean over the same threshold/class grid)."""
    thrs = [round(0.5 + 0.05 * i, 2) for i in range(10)]
    aps, ars = [], []
    img_ids = sorted(set(ground_truth) | set(detections))
    for cls in range(num_classes):
        per_img = []          # (sorted dets, gt boxes) per image
        npos = 0
        for img_id in img_ids:
            g = ground_truth.get(img_id)
            if g is None:
                gboxes = np.zeros((0, 4))
            else:
                sel = np.asarray(g["classes"]) == cls
                gboxes = np.asarray(g["boxes"], np.float64)[sel]
            npos += len(gboxes)
            dets = sorted((d for d in detections.get(img_id, ())
                           if d[0] == cls),
                          key=lambda d: -d[1])[:max_dets]
            per_img.append((dets, gboxes))
        if npos == 0:
            continue
        ap_sum = 0.0
        ar_sum = 0.0
        for thr in thrs:
            recs = []                        # (score, is_tp)
            for dets, gboxes in per_img:
                used = [False] * len(gboxes)
                for d in dets:
                    box = d[2:6]
                    best = min(thr, 1.0 - 1e-10)
                    bj = -1
                    for j, gb in enumerate(gboxes):
                        if used[j]:
                            continue
                        v = _iou_cont(box, gb)
                        if v >= best:        # later equal IoU wins
                            best, bj = v, j
                    if bj >= 0:
                        used[bj] = True
                    recs.append((d[1], bj >= 0))
            recs.sort(key=lambda r: -r[0])   # stable global merge
            tp = fp = 0
            rec, prec = [], []
            for _s, is_tp in recs:
                tp += is_tp
                fp += not is_tp
                rec.append(tp / npos)
                prec.append(tp / (tp + fp))
            # precision envelope, sampled at the fixed 101 recall pts
            for i in range(len(prec) - 1, 0, -1):
                prec[i - 1] = max(prec[i - 1], prec[i])
            s = 0.0
            for pt in np.linspace(0.0, 1.0, 101):
                idx = next((i for i, r in enumerate(rec) if r >= pt),
                           None)
                s += prec[idx] if idx is not None else 0.0
            ap_sum += s / 101.0
            ar_sum += rec[-1] if rec else 0.0
        aps.append(ap_sum / len(thrs))
        ars.append(ar_sum / len(thrs))
    return {"map": float(np.mean(aps)) if aps else 0.0,
            "ar": float(np.mean(ars)) if ars else 0.0}


def _synth_gt(detections, samples, rng, num_classes):
    """GT = the model's own detections, box-jittered +- up to 2%, plus
    one random distractor per image — non-degenerate PR curves with
    genuine TP/FP mixtures."""
    gt = {}
    for img_id, (path, (h, w)) in enumerate(samples):
        boxes, classes = [], []
        # the model's top detections per image, whatever their absolute
        # scores (random weights give scores near conf*1/C ~ 0.025)
        for (c, s, x1, y1, x2, y2) in detections.get(img_id, [])[:5]:
            j = rng.uniform(-0.02, 0.02, 4) * [w, h, w, h]
            boxes.append(np.clip([x1 + j[0], y1 + j[1],
                                  x2 + j[2], y2 + j[3]],
                                 0, [w, h, w, h]))
            classes.append(c)
        # one distractor box per image (usually an FN/FP source)
        bw, bh = rng.uniform(0.2, 0.5) * w, rng.uniform(0.2, 0.5) * h
        x1 = rng.uniform(0, w - bw)
        y1 = rng.uniform(0, h - bh)
        boxes.append([x1, y1, x1 + bw, y1 + bh])
        classes.append(int(rng.integers(0, num_classes)))
        gt[img_id] = {"boxes": np.asarray(boxes, np.float64),
                      "classes": np.asarray(classes, np.int64),
                      "difficult": np.zeros(len(classes), np.int64)}
    return gt


# Cache one dual-stack run per (key): the COCO-protocol test re-scores
# the tiny-voc run rather than paying a second forward sweep. Entries
# are (dets_jax, dets_tf, gt, params, samples) — params/samples ride
# along so the mutation canaries REUSE the exact inputs the cached gt
# derives from instead of re-deriving the RNG stream (advisor r4: a
# re-derivation silently diverges if _run_stacks' draw order changes,
# leaving a canary vacuous without failing).
_RUN_CACHE = {}


def _run_stacks(tmp_path, cfg, *, resize="letterbox", n_images=N_IMAGES,
                key=None, min_dets=50, use_tree_map=False):
    """One dual-stack sweep: JAX production collect_detections vs the
    TF stack, plus synthetic GT. Returns (dets_jax, dets_tf, gt)."""
    if key is not None and key in _RUN_CACHE:
        return _RUN_CACHE[key][:3]
    from yolo_tpu.eval.runner import collect_detections
    from yolo_tpu.models import graph

    rng = np.random.default_rng(0)
    params = _realistic_params(cfg, rng)
    folded = graph.params_to_jax(
        graph.fold_params(cfg.layers, params, cfg.bn_eps))
    samples = _make_images(tmp_path, rng, n=n_images)
    run_samples = [(p, None) for p, _ in samples]

    dets_jax = collect_detections(
        cfg, folded, run_samples, batch=10, eval_conf=EVAL_CONF,
        compute_dtype=jnp.float32, resize=resize,
        use_tree_map=use_tree_map)
    n_jax = sum(len(v) for v in dets_jax.values())
    assert n_jax > min_dets, f"degenerate run: only {n_jax} jax dets"

    dets_tf = _tf_collect(cfg, params, samples, EVAL_CONF,
                          resize=resize, use_tree_map=use_tree_map)
    gt = _synth_gt(dets_jax, samples, np.random.default_rng(7),
                   cfg.num_detection_classes(use_tree_map))
    if key is not None:
        _RUN_CACHE[key] = (dets_jax, dets_tf, gt, params, samples)
    return dets_jax, dets_tf, gt


def _assert_voc_parity(cfg, dets_jax, dets_tf, gt, num_classes=None):
    from yolo_tpu.eval.voc_map import evaluate

    nc = cfg.num_classes if num_classes is None else num_classes
    map_jax = evaluate(dets_jax, gt, nc, use_07_metric=True)["map"]
    map_tf = _voc_map_oracle(dets_tf, gt, nc)

    # non-vacuous: GT derives from the model's own detections, so real
    # TP/FP mixtures exist (the 100-detection cap keeps absolute
    # precision low); the distractor boxes keep it < 1
    assert 0.02 < map_jax < 0.999, map_jax
    # the parity gate: two fully independent stacks, one number
    n_jax = sum(len(v) for v in dets_jax.values())
    n_tf = sum(len(v) for v in dets_tf.values())
    assert abs(map_jax - map_tf) < 2e-3, (
        f"dual-stack mAP drift: jax {map_jax:.6f} vs tf {map_tf:.6f} "
        f"({n_jax} vs {n_tf} detections)")

    # cross-scoring isolates the EVALUATOR: both scorers must agree on
    # the SAME detection set to float tolerance
    same_jax = _voc_map_oracle(dets_jax, gt, nc)
    assert abs(map_jax - same_jax) < 1e-6, (map_jax, same_jax)


@pytest.mark.parametrize("variant", ["tiny-voc", "yolov3-tiny"])
def test_dual_stack_voc_map_parity(tmp_path, variant):
    from yolo_tpu.configs import get_variant

    cfg = get_variant(variant, input_size=416)  # full 416, tiny trunks
    key = variant if variant == "tiny-voc" else None
    dets_jax, dets_tf, gt = _run_stacks(tmp_path, cfg, key=key)
    _assert_voc_parity(cfg, dets_jax, dets_tf, gt)


def test_dual_stack_map_parity_yolov2_coco(tmp_path):
    """The FULL yolov2 path — darknet-19 trunk, route -9 / conv64 /
    reorg passthrough, region head, COCO-80 — which the tiny variants
    never exercise. Fewer images bound the full-trunk TF forward on
    this 1-core box; the protocol surface (decode/NMS/unmap/eval) sees
    the same hundreds of detections."""
    from yolo_tpu.configs import get_variant

    cfg = get_variant("coco", input_size=416)
    dets_jax, dets_tf, gt = _run_stacks(
        tmp_path, cfg, n_images=max(16, N_IMAGES // 4), min_dets=30,
        key="coco")
    _assert_voc_parity(cfg, dets_jax, dets_tf, gt)


@pytest.mark.parametrize("rect", [False, True])
def test_dual_stack_map_parity_stretch(tmp_path, rect):
    """Stretch (AlexeyAB letter_box=0) geometry end-to-end: plain
    aspect-ignoring resize in, unstretch unmapping out — the geometry
    pair the letterbox runs never score; the rect parametrization
    combines it with a non-square 256x416 canvas (per-axis scales)."""
    from yolo_tpu.configs import get_variant

    cfg = get_variant("tiny-voc", input_size=416)
    if rect:
        cfg = cfg.with_input_hw(256, 416)
    dets_jax, dets_tf, gt = _run_stacks(
        tmp_path, cfg, resize="stretch",
        n_images=max(24, N_IMAGES // 2),
        key=None if rect else "stretch")
    _assert_voc_parity(cfg, dets_jax, dets_tf, gt)


def test_proxy_sensitivity_canary_stretch(tmp_path):
    """Stretch-geometry mutation canary (completes the per-surface
    set: decode / NMS / letterbox / stretch): swapping the source
    w/h in the TF stack's unstretch — a transposed-axes bug —
    rescales every box by the aspect ratio, so IoU matches against
    the aligned-protocol gt flip and the dual-stack delta must clear
    the 2e-3 gate (the variable-aspect eval images make the swap
    non-neutral)."""
    from yolo_tpu.configs import get_variant
    from yolo_tpu.eval.voc_map import evaluate

    cfg = get_variant("tiny-voc", input_size=416)
    dets_jax, _dets_tf, gt = _run_stacks(
        tmp_path, cfg, resize="stretch",
        n_images=max(24, N_IMAGES // 2), key="stretch")
    map_jax = evaluate(dets_jax, gt, cfg.num_classes,
                       use_07_metric=True)["map"]
    _, _, _, params, samples = _RUN_CACHE["stretch"]
    dets_bad = _tf_collect(cfg, params, samples, EVAL_CONF,
                           resize="stretch", swap_stretch_axes=True)
    map_bad = _voc_map_oracle(dets_bad, gt, cfg.num_classes)
    assert abs(map_jax - map_bad) > 2e-3, (
        f"stretch canary NOT sensitive: aligned {map_jax:.6f} vs "
        f"axes-swapped {map_bad:.6f}")


def test_dual_stack_map_parity_rect(tmp_path):
    """A rectangular net (416x256): per-axis letterbox geometry,
    non-square grid decode, and per-axis unmapping through BOTH stacks
    — exactly where a transposed (h, w) would move the mAP."""
    from yolo_tpu.configs import get_variant

    cfg = get_variant("tiny-voc", input_size=416).with_input_hw(256, 416)
    dets_jax, dets_tf, gt = _run_stacks(
        tmp_path, cfg, n_images=max(24, N_IMAGES // 2))
    _assert_voc_parity(cfg, dets_jax, dets_tf, gt)


@pytest.mark.parametrize("variant", ["tiny-voc", "coco"])
def test_dual_stack_coco_protocol(tmp_path, variant):
    """COCO mAP@[.5:.95] + AR@100 protocol parity on the same synthetic
    set: eval/coco_map.evaluate_coco (production) vs the clean-room
    loop scorer here, on BOTH stacks' detections — for the tiny-voc
    run AND the full yolov2-coco region+reorg run (80 classes).
    Same-set cross-scoring isolates the evaluator from the stacks."""
    from yolo_tpu.configs import get_variant
    from yolo_tpu.eval.coco_map import evaluate_coco

    cfg = get_variant(variant, input_size=416)
    kw = ({"n_images": max(16, N_IMAGES // 4), "min_dets": 30}
          if variant == "coco" else {})
    dets_jax, dets_tf, gt = _run_stacks(tmp_path, cfg, key=variant,
                                        **kw)

    prod = evaluate_coco(dets_jax, gt, cfg.num_classes)
    oracle_tf = _coco_map_oracle(dets_tf, gt, cfg.num_classes)
    assert 0.005 < prod["map"] < 0.999, prod["map"]
    assert abs(prod["map"] - oracle_tf["map"]) < 2e-3, (
        f"dual-stack COCO mAP drift: jax {prod['map']:.6f} "
        f"vs tf {oracle_tf['map']:.6f}")
    assert abs(prod["ar"] - oracle_tf["ar"]) < 2e-3, (
        f"dual-stack COCO AR drift: jax {prod['ar']:.6f} "
        f"vs tf {oracle_tf['ar']:.6f}")

    # evaluator isolation: identical detections, two scorers — both
    # the AP and the AR@100 cells must agree to float tolerance
    same_jax = _coco_map_oracle(dets_jax, gt, cfg.num_classes)
    assert abs(prod["map"] - same_jax["map"]) < 1e-6, (prod, same_jax)
    assert abs(prod["ar"] - same_jax["ar"]) < 1e-6, (prod, same_jax)


# ---------------------------------------------------------------------------
# round-4 continuation: the remaining head families through the same
# two-stack end-to-end gate (micro topologies — the protocol surface
# is the head decode + NMS + unmapping, not trunk depth)
# ---------------------------------------------------------------------------

def test_dual_stack_map_parity_gaussian(tmp_path):
    """[Gaussian_yolo] heads end-to-end: the interleaved 9+C channel
    layout, uc_aver score factor, and two-scale head concat through
    BOTH stacks — where a de-interleaved read or a missing uncertainty
    factor would move the mAP."""
    from tests.test_gaussian_yolo import MICRO_GAUSS

    dets_jax, dets_tf, gt = _run_stacks(
        tmp_path, MICRO_GAUSS, n_images=max(24, N_IMAGES // 2),
        min_dets=30, key="gauss")
    _assert_voc_parity(MICRO_GAUSS, dets_jax, dets_tf, gt)


def test_proxy_sensitivity_canary(tmp_path):
    """Mutation canary: the dual-stack gate must actually TRIP when a
    stack drifts — guards the proxy against silently becoming vacuous
    (e.g. both stacks importing the same decode). Scaling the TF
    stack's anchors 1.5x flips IoU matches and moves its mAP by ~0.16
    on this setup (aligned stacks agree exactly). The mutation must
    change MATCHING or score ORDER to register: a 15% scale_xy
    perturbation (boxes shift ~1% of the image, scores untouched) was
    measured mAP-invariant — the gate detects protocol drift, not
    sub-IoU-resolution box noise."""
    import dataclasses

    # _canary_run reuses the EXACT cached params/samples the gt derives
    # from — no RNG-stream re-derivation to silently diverge (advisor r4)
    cfg, gt, map_jax, params, samples = _canary_run(tmp_path)
    bad_cfg = dataclasses.replace(
        cfg, anchors=tuple((w * 1.5, h * 1.5) for w, h in cfg.anchors))
    dets_bad = _tf_collect(bad_cfg, params, samples, EVAL_CONF)
    map_bad = _voc_map_oracle(dets_bad, gt, cfg.num_classes)
    assert abs(map_jax - map_bad) > 2e-3, (
        f"proxy NOT sensitive: aligned {map_jax:.6f} vs perturbed "
        f"{map_bad:.6f}")


def _canary_run(tmp_path):
    """The shared aligned run + score for the mutation canaries."""
    from tests.test_gaussian_yolo import MICRO_GAUSS
    from yolo_tpu.eval.voc_map import evaluate

    dets_jax, _dets_tf, gt = _run_stacks(
        tmp_path, MICRO_GAUSS, n_images=max(24, N_IMAGES // 2),
        min_dets=30, key="gauss")
    map_jax = evaluate(dets_jax, gt, MICRO_GAUSS.num_classes,
                       use_07_metric=True)["map"]
    _, _, _, params, samples = _RUN_CACHE["gauss"]
    return MICRO_GAUSS, gt, map_jax, params, samples


def test_proxy_sensitivity_canary_nms(tmp_path):
    """NMS-surface mutation canary (VERDICT r4 weak #5: the decode
    canary alone leaves the NMS protocol mirror's sensitivity
    unproven). Disabling greedy suppression in the TF mirror floods
    every strong detection with its near-duplicates — precision
    collapses and the 100-det cap displaces true positives — so the
    dual-stack delta must clear the same 2e-3 gate the parity asserts
    under. If both stacks ever silently shared one NMS, this stops
    being able to trip and fails."""
    cfg, gt, map_jax, params, samples = _canary_run(tmp_path)

    def no_suppress(boxes, scores, conf, iou, *, top_k=128,
                    max_det=100):
        n, c = scores.shape
        out = []
        for cls in range(c):
            s = scores[:, cls]
            order = np.lexsort((np.arange(n), -s))[:top_k]
            out.extend((boxes[i], float(s[i]), cls)
                       for i in order if s[i] >= conf)
        out.sort(key=lambda r: -r[1])
        return out[:max_det]

    dets_bad = _tf_collect(cfg, params, samples, EVAL_CONF,
                           nms_fn=no_suppress)
    map_bad = _voc_map_oracle(dets_bad, gt, cfg.num_classes)
    assert abs(map_jax - map_bad) > 2e-3, (
        f"NMS canary NOT sensitive: aligned {map_jax:.6f} vs "
        f"suppression-off {map_bad:.6f}")


def test_proxy_sensitivity_canary_geometry(tmp_path):
    """Letterbox/unmap-surface mutation canary: dropping the centered
    pad origin (px=py=0) in the TF stack's unmap shifts every box by
    pad/scale source pixels on the padded axis — IoU matches against
    the centered-protocol gt flip, so the dual-stack delta must clear
    the gate. Proves the proxy would catch a pad-origin drift in
    either stack's letterbox/unletterbox chain."""
    cfg, gt, map_jax, params, samples = _canary_run(tmp_path)
    dets_bad = _tf_collect(cfg, params, samples, EVAL_CONF,
                           zero_pad_origin=True)
    map_bad = _voc_map_oracle(dets_bad, gt, cfg.num_classes)
    assert abs(map_jax - map_bad) > 2e-3, (
        f"geometry canary NOT sensitive: aligned {map_jax:.6f} vs "
        f"zero-pad-origin {map_bad:.6f}")


def test_dual_stack_map_parity_scaled_newcoords(tmp_path):
    """Scaled-yolov4 [yolo] new_coords=1 + scale_x_y=2 end-to-end:
    logistic head convs (no second sigmoid), (2v)^2 * anchor wh, and
    the scale_x_y offset through BOTH stacks."""
    from tests.test_scaled_yolov4 import MICRO_SCALED

    dets_jax, dets_tf, gt = _run_stacks(
        tmp_path, MICRO_SCALED, n_images=max(24, N_IMAGES // 2),
        min_dets=30)
    _assert_voc_parity(MICRO_SCALED, dets_jax, dets_tf, gt)


def test_dual_stack_map_parity_yolov1(tmp_path):
    """yolov1 [detection] end-to-end: the [crop]/[local]/[connected]
    trunk, the flat CHW head layout (classes | confs | coords), sqrt
    wh, and conf*prob scoring through BOTH stacks — the TF stack's
    extract_patches [local] derivation uses a DIFFERENT patch order
    than the production executor, so layout drift moves the number."""
    from tests.test_yolov1 import V1_CFG
    from yolo_tpu.configs.darknet_cfg import config_from_cfg

    p = tmp_path / "v1.cfg"
    p.write_text(V1_CFG)
    cfg = config_from_cfg(str(p))
    dets_jax, dets_tf, gt = _run_stacks(
        tmp_path, cfg, n_images=max(24, N_IMAGES // 2), min_dets=30)
    _assert_voc_parity(cfg, dets_jax, dets_tf, gt)


# ---------------------------------------------------------------------------
# round-5: TRAINED + EXPORTED weights through the dual-stack gate
# (VERDICT r4 missing #1). Chain: train (BN rolling stats + EMA track)
# -> orbax checkpoint -> `export` CLI -> darknet .weights file ->
#   (a) production loader -> BN fold -> collect_detections (JAX stack)
#   (b) an INDEPENDENT loop-level byte parser here -> TF forward on the
#       UNFOLDED rolling stats -> loop decode -> protocol NMS
# -> two mAPs, one gate. Trained BN-stat folding, EMA selection, and
# the export transposes all sit inside the independent-stack
# comparison; failures localize (byte-walk assert vs parity gate vs
# the evaluator cross-score in _assert_voc_parity).
# ---------------------------------------------------------------------------

def _read_darknet_weights_independent(path, layers, in_ch=3):
    """Independent loop-level .weights reader for the trained-export
    gate (no io/darknet_weights import): 20-byte header (major 0,
    minor 2: three int32 + int64 seen), then per WEIGHTED layer in
    file order —
      [convolutional]: bias/beta (oc floats), then gamma/rolling-mean/
        rolling-var (oc each) when batch-normalized, then the kernel
        in darknet OIHW — transposed HERE to HWIO for the TF oracle;
      [connected]: bias[out], then weights[out*in] ROW-MAJOR (out, in)
        — transposed to (in, out);
      [local]: biases [filters*H'*W'] in CHW order -> (H', W',
        filters), then LOCATION-MAJOR (H', W', filters, in_c, k, k)
        filter blocks (the format-derived v1 layout).
    The channel walk re-derives input depths across the micro models'
    layer kinds (parse.c semantics: Route concats referenced outputs;
    Shortcut/YoloHead/Upsample/MaxPool/Crop/Dropout/DetectionHead
    preserve depth and carry no weights)."""
    import struct

    from yolo_tpu.configs.specs import (Connected, Conv, Crop,
                                        DetectionHead, Dropout, Local,
                                        MaxPool, Route, Shortcut,
                                        Upsample, YoloHead)

    raw = open(path, "rb").read()
    major, minor, rev = struct.unpack("<iii", raw[:12])
    assert (major, minor, rev) == (0, 2, 0), (major, minor, rev)
    seen = struct.unpack("<q", raw[12:20])[0]
    off = 20

    def take(n):
        nonlocal off
        a = np.frombuffer(raw, np.float32, n, off).copy()
        off += 4 * n
        return a

    params = []
    out_ch = []          # per layer-index output depth
    cur = in_ch
    for li, layer in enumerate(layers):
        if isinstance(layer, Conv):
            oc, k, g = layer.filters, layer.size, layer.groups
            p = {}
            if layer.bn:
                p["beta"] = take(oc)
                p["gamma"] = take(oc)
                p["mean"] = take(oc)
                p["var"] = take(oc)
            else:
                p["bias"] = take(oc)
            kern = take(oc * (cur // g) * k * k).reshape(
                oc, cur // g, k, k)
            p["kernel"] = kern.transpose(2, 3, 1, 0)
            params.append(p)
            cur = oc
        elif isinstance(layer, Connected):
            # parser.c save_connected_weights: biases[out], then
            # weights[out*in] ROW-MAJOR (out, in) — transposed here to
            # (in, out); spatial [connected] reads the parse-pinned
            # flattened feature count (weight size depends on it)
            oc = layer.out
            ic = (layer.in_features if layer.in_features is not None
                  else cur)
            p = {"bias": take(oc),
                 "kernel": take(oc * ic).reshape(oc, ic).T.copy()}
            params.append(p)
            cur = oc
        elif isinstance(layer, Local):
            # format-derived [local] block (specs.Local): biases
            # [filters*H'*W'] in CHW order -> (H', W', filters) here;
            # then LOCATION-MAJOR (H', W', filters, in_c, k, k) filter
            # blocks. Geometry (out_h/out_w/in_c) is the parse-pinned
            # spec fields — the byte ORDER/reshapes are transcribed
            # independently from the pinned format notes.
            hh, ww = layer.out_h, layer.out_w
            oc, icc, k = layer.filters, layer.in_c, layer.size
            bias = take(oc * hh * ww).reshape(oc, hh, ww)
            w = take(hh * ww * oc * icc * k * k).reshape(
                hh, ww, oc, icc, k, k)
            params.append({"bias": bias.transpose(1, 2, 0).copy(),
                           "kernel": w})
            cur = oc
        elif isinstance(layer, Route):
            refs = [r if r >= 0 else li + r for r in layer.layers]
            cur = sum(out_ch[r] // layer.groups for r in refs)
        elif isinstance(layer, (MaxPool, Upsample, YoloHead, Shortcut,
                                Crop, Dropout, DetectionHead)):
            pass  # depth-preserving/weightless (plain shortcut only)
        else:
            raise NotImplementedError(type(layer).__name__)
        out_ch.append(cur)
    assert off == len(raw), (off, len(raw))
    return params, seen


def _rect_eval_images(tmp_path, rng, n=16):
    """Painted-rectangle scenes in the training distribution, at VARIED
    sizes so the letterbox geometry engages in both stacks."""
    import cv2

    samples = []
    for i in range(n):
        h = int(rng.integers(80, 180))
        w = int(rng.integers(80, 180))
        img = np.zeros((h, w, 3), np.float32) + 0.1
        for _ in range(2):
            cx, cy = rng.uniform(0.25, 0.75, 2)
            bw, bh = rng.uniform(0.25, 0.45, 2)
            x1, y1 = int((cx - bw / 2) * w), int((cy - bh / 2) * h)
            x2, y2 = int((cx + bw / 2) * w), int((cy + bh / 2) * h)
            img[max(y1, 0):y2, max(x1, 0):x2] = rng.uniform(0.3, 1.0, 3)
        p = str(tmp_path / f"e{i}.png")
        cv2.imwrite(p, (img[..., ::-1] * 255).astype(np.uint8))
        samples.append((p, (h, w)))
    return samples


@pytest.mark.parametrize("family", ["region", "yolo", "gaussian",
                                    "tree", "v1"])
def test_dual_stack_map_trained_exported_weights(tmp_path, family):
    """region + yolo export through the full CLI; gaussian (the
    interleaved 9+C head layout), YOLO9000 tree (hierarchical class
    channels), and yolov1 (the FORMAT-DERIVED [local]/[connected]
    blocks — the weakest-pinned layout surface, reference absent)
    export through the same production building blocks
    (ema_params_of -> dw.save — the CLI's EMA wiring is gated by the
    first two params + test_export_prefers_ema; a programmatic tree
    cfg has no tree= file for cfg text)."""
    import jax

    from tests.test_map_integration import _dataset
    from yolo_tpu import cli
    from yolo_tpu.configs.darknet_cfg import cfg_to_string
    from yolo_tpu.data import targets as tgt
    from yolo_tpu.eval.runner import collect_detections
    from yolo_tpu.io import checkpoint as ckpt
    from yolo_tpu.io import darknet_weights as dw
    from yolo_tpu.models import graph
    from yolo_tpu.train.loop import (TrainConfig, ema_params_of,
                                     init_state, make_train_step)

    if family == "region":
        from tests.test_train import MICRO as cfg
    elif family == "yolo":
        from tests.test_yolov3 import MICRO_V3 as cfg
    elif family == "gaussian":
        from tests.test_gaussian_yolo import MICRO_GAUSS as cfg
    elif family == "v1":
        from tests.test_yolov1 import V1_CFG
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        p = tmp_path / "v1.cfg"
        p.write_text(V1_CFG)
        cfg = config_from_cfg(str(p))
    else:
        cfg = _micro_tree_cfg(tmp_path).with_input_size(64)

    # --- train with BN rolling stats + an EMA track ---
    scenes = _dataset()
    if family in ("region", "tree"):
        # tree labels are NODES (0-3 here: high nodes of the micro
        # tree); the hierarchical class term trains their root paths
        enc = tgt.encode_batch(
            [s[1] for s in scenes], [s[2] for s in scenes],
            grid=cfg.grid_size, anchors=cfg.anchors,
            num_classes=cfg.num_classes)
    else:
        if family == "v1":
            # the 4-scene classes run 0-3; the v1 micro has 3 classes
            scenes = [(img, b, np.minimum(c, cfg.num_classes - 1))
                      for img, b, c in scenes]
        enc = tgt.encode_batch_for(cfg, [s[1] for s in scenes],
                                   [s[2] for s in scenes])
    batch = {k: jnp.asarray(v) for k, v in enc.items()}
    batch["images"] = jnp.asarray(np.stack([s[0] for s in scenes]))
    tcfg = TrainConfig(learning_rate=3e-3, optimizer="adam",
                       weight_decay=0.0, ema_alpha=0.9)
    state = init_state(dw.random_params(cfg.layers,
                                        np.random.default_rng(0)), tcfg)
    step = make_train_step(cfg, tcfg)
    for _ in range(500):
        state, _metrics = step(state, batch)

    # --- checkpoint -> production export (EMA-preferring) ---
    wpath = str(tmp_path / "trained.weights")
    if family in ("region", "yolo"):
        ckpt.save(str(tmp_path / "ck"), jax.device_get(dict(state)))
        cfg_path = tmp_path / "m.cfg"
        cfg_path.write_text(cfg_to_string(cfg))
        cli.main(["export", "--cfg", str(cfg_path),
                  "--checkpoint", str(tmp_path / "ck"),
                  "--output", wpath])
    else:
        dw.save(wpath, cfg.layers,
                [{k: np.asarray(v) for k, v in p.items()}
                 for p in jax.device_get(ema_params_of(state))])

    # EMA selection is non-vacuous: the exported kernel is the EMA
    # track, and the EMA track differs from the live weights
    got, _hdr = dw.load(wpath, cfg.layers)
    ema = jax.device_get(ema_params_of(state))
    live = jax.device_get(state["params"])
    np.testing.assert_allclose(got[0]["kernel"],
                               np.asarray(ema[0]["kernel"]), rtol=1e-6)
    assert np.abs(np.asarray(ema[0]["kernel"])
                  - np.asarray(live[0]["kernel"])).max() > 1e-7

    # independent byte walk agrees with the production loader tensor
    # by tensor (localizes export/load transposes)
    params_tf, _seen = _read_darknet_weights_independent(
        wpath, cfg.layers)
    assert len(params_tf) == len(got)
    for a, b in zip(params_tf, got):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], np.asarray(b[k]))

    # --- the dual-stack gate on the TRAINED weights ---
    samples = _rect_eval_images(tmp_path, np.random.default_rng(5))
    eval_conf = 0.01
    folded = graph.params_to_jax(
        graph.fold_params(cfg.layers, got, cfg.bn_eps))
    dets_jax = collect_detections(
        cfg, folded, [(p, None) for p, _ in samples], batch=8,
        eval_conf=eval_conf, compute_dtype=jnp.float32)
    n_jax = sum(len(v) for v in dets_jax.values())
    assert n_jax > 20, f"degenerate trained run: {n_jax} dets"
    dets_tf = _tf_collect(cfg, params_tf, samples, eval_conf)
    gt = _synth_gt(dets_jax, samples, np.random.default_rng(7),
                   cfg.num_classes)
    _assert_voc_parity(cfg, dets_jax, dets_tf, gt)


@pytest.mark.filterwarnings("ignore:invalid value encountered")
def test_trained_export_gate_canary(tmp_path):
    """Mutation canary for the trained-export gate (same standard as
    the per-surface proxy canaries): a drifted byte walk — rolling
    mean and var swapped in the independent parse, the kind of
    field-order bug the gate exists to catch — must move the TF
    stack's mAP off the JAX stack's by more than the 2e-3 gate. (The
    swapped 'var' can be a negative trained mean, so the drifted
    stack's BN may NaN — a legitimate, loud trip; the warning filter
    covers the oracle softmax on those NaNs.) Run on a shortened
    region-family chain (the full chain is gated by
    test_dual_stack_map_trained_exported_weights)."""
    import jax

    from tests.test_map_integration import _dataset
    from tests.test_train import MICRO as cfg
    from yolo_tpu.data import targets as tgt
    from yolo_tpu.eval.runner import collect_detections
    from yolo_tpu.eval.voc_map import evaluate
    from yolo_tpu.io import darknet_weights as dw
    from yolo_tpu.models import graph
    from yolo_tpu.train.loop import (TrainConfig, ema_params_of,
                                     init_state, make_train_step)

    scenes = _dataset()
    enc = tgt.encode_batch([s[1] for s in scenes],
                           [s[2] for s in scenes],
                           grid=cfg.grid_size, anchors=cfg.anchors,
                           num_classes=cfg.num_classes)
    batch = {k: jnp.asarray(v) for k, v in enc.items()}
    batch["images"] = jnp.asarray(np.stack([s[0] for s in scenes]))
    tcfg = TrainConfig(learning_rate=3e-3, optimizer="adam",
                       weight_decay=0.0, ema_alpha=0.9)
    state = init_state(dw.random_params(cfg.layers,
                                        np.random.default_rng(0)), tcfg)
    step = make_train_step(cfg, tcfg)
    for _ in range(300):
        state, _ = step(state, batch)
    wpath = str(tmp_path / "t.weights")
    dw.save(wpath, cfg.layers,
            [{k: np.asarray(v) for k, v in p.items()}
             for p in jax.device_get(ema_params_of(state))])

    params_tf, _ = _read_darknet_weights_independent(wpath, cfg.layers)
    samples = _rect_eval_images(tmp_path, np.random.default_rng(5))
    eval_conf = 0.01
    folded = graph.params_to_jax(graph.fold_params(
        cfg.layers, dw.load(wpath, cfg.layers)[0], cfg.bn_eps))
    dets_jax = collect_detections(
        cfg, folded, [(p, None) for p, _ in samples], batch=8,
        eval_conf=eval_conf, compute_dtype=jnp.float32)
    assert sum(len(v) for v in dets_jax.values()) > 20
    gt = _synth_gt(dets_jax, samples, np.random.default_rng(7),
                   cfg.num_classes)
    map_jax = evaluate(dets_jax, gt, cfg.num_classes,
                       use_07_metric=True)["map"]

    # aligned parse agrees (the gate itself, abbreviated)
    dets_tf = _tf_collect(cfg, params_tf, samples, eval_conf)
    map_tf = _voc_map_oracle(dets_tf, gt, cfg.num_classes)
    assert abs(map_jax - map_tf) < 2e-3, (map_jax, map_tf)

    # drifted parse: swap the rolling mean/var fields (a field-order
    # byte-walk bug) — the gate must trip
    bad = []
    for p in params_tf:
        q = dict(p)
        if "mean" in q:
            q["mean"], q["var"] = q["var"], q["mean"]
        bad.append(q)
    dets_bad = _tf_collect(cfg, bad, samples, eval_conf)
    map_bad = _voc_map_oracle(dets_bad, gt, cfg.num_classes)
    assert abs(map_jax - map_bad) > 2e-3, (
        f"trained-export gate NOT sensitive: aligned {map_jax:.6f} "
        f"vs mean/var-swapped {map_bad:.6f}")


def _micro_tree_cfg(tmp_path, with_map=False):
    from tests.test_tree import TREE_TEXT
    from yolo_tpu.configs.specs import Conv, ModelConfig
    from yolo_tpu.configs.tree import parse_tree

    tp = tmp_path / "micro.tree"
    tp.write_text(TREE_TEXT)
    tree = parse_tree(str(tp))
    tree_map = (tuple(i for i in range(tree.n_nodes) if tree.leaf(i))
                if with_map else None)
    return ModelConfig(
        name="micro9000",
        layers=(Conv(8, stride=2), Conv(16, stride=2),
                Conv(16, stride=2), Conv(32, stride=2),
                Conv(32, stride=2),
                Conv(2 * (5 + tree.n_nodes), size=1, bn=False,
                     act="linear")),
        anchors=((1.0, 1.5), (2.5, 2.0)),
        class_names=tree.names, input_size=192,
        tree=tree, hier_thresh=0.3, tree_map=tree_map)


def test_dual_stack_map_parity_tree(tmp_path):
    """YOLO9000 [region] tree end-to-end in darknet's detector mode:
    per-sibling-group softmax, greedy traversal under hier_thresh, the
    predicted node scoring conf — through BOTH stacks (the TF stack
    re-derives the traversal loop-level from numpy_ref's oracles)."""
    cfg = _micro_tree_cfg(tmp_path)
    dets_jax, dets_tf, gt = _run_stacks(
        tmp_path, cfg, n_images=max(24, N_IMAGES // 2), min_dets=30)
    _assert_voc_parity(cfg, dets_jax, dets_tf, gt)


def test_dual_stack_map_parity_tree_map_projection(tmp_path):
    """YOLO9000 .map projection mode (--use-tree-map, darknet's
    COCO-validation scoring): score_j = conf * absolute[map[j]] over
    the map's class list — continuous scores through BOTH stacks,
    scored over len(map) classes."""
    cfg = _micro_tree_cfg(tmp_path, with_map=True)
    dets_jax, dets_tf, gt = _run_stacks(
        tmp_path, cfg, n_images=max(24, N_IMAGES // 2), min_dets=30,
        use_tree_map=True)
    _assert_voc_parity(cfg, dets_jax, dets_tf, gt,
                       num_classes=cfg.num_detection_classes(True))
