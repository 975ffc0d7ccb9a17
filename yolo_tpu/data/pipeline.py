"""Host data pipeline: parallel JPEG decode + prefetched, double-buffered
device staging (SURVEY.md §3.2-3.3; BASELINE.json:5 'double-buffered HBM
staging').

The reference loops PIL decode -> feed_dict serially per step (its
bottleneck). Here host workers decode/preprocess ahead of the device and
`device_put` runs ``prefetch`` batches ahead, so the accelerator never
waits on the host:

  inference: decode -> raw-RGB batch (device does letterbox inside the
             jitted graph, ops/letterbox.py)
  training:  decode -> host letterbox (variable source sizes) -> GT encode
             -> fixed-shape batch

JPEG decode stays on host by hardware necessity (SURVEY.md §5.8).
"""

from __future__ import annotations

import concurrent.futures as cf
import threading
import queue as queue_mod
from typing import Dict, Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np


# Host image decoder: "cv2" (default) or "native" (native/decode.cpp —
# libjpeg/libpng in C++, bit-identical to cv2 on this image's libjpeg,
# decode-parity-tested either way; set via `--decoder native`). The
# native decoder also unlocks the fused decode->letterbox batch loader
# in inference_batches (ONE C++ call per batch, the darknet data.c
# role).
_DECODER = "cv2"


def set_decoder(name: str) -> None:
    """Select the host image decoder for this process ("cv2" |
    "native"). Raises if the native library is unavailable rather than
    silently decoding differently than asked."""
    global _DECODER
    if name not in ("cv2", "native"):
        raise ValueError(f"unknown decoder {name!r} (cv2 | native)")
    if name == "native":
        from yolo_tpu.native import preproc

        if not preproc.available():
            raise RuntimeError(
                "--decoder native: libyolopreproc.so is unavailable "
                "(no toolchain?) — build it with `make -C native` or "
                "use --decoder cv2")
    _DECODER = name


def get_decoder() -> str:
    return _DECODER


def _load_image_cv2(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(f"cannot decode image: {path}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def _load_image_cv2_gray(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(f"cannot decode image: {path}")
    return img[..., None]


def load_image_rgb(path: str) -> np.ndarray:
    """Host JPEG/PNG decode -> (H, W, 3) uint8 RGB."""
    if _DECODER == "native":
        from yolo_tpu.native.preproc import decode_image

        img = decode_image(path)
        if img is not None:
            return img
        # formats the native decoder doesn't cover (e.g. bmp) or a
        # file cv2 may still salvage — fall through
    return _load_image_cv2(path)


def load_image(path: str, channels: int = 3) -> np.ndarray:
    """Host decode at the model's channel count ([net] channels) ->
    (H, W, C) uint8. channels=3 is load_image_rgb; channels=1 is
    cv2.IMREAD_GRAYSCALE semantics — darknet-OpenCV's exact grayscale
    path (image_opencv load_image_mat flag 0, BT.601 luma). Under
    --decoder native the C++ decoder covers grayscale too: JPEG via
    libjpeg JCS_GRAYSCALE (the same library path cv2's own grayscale
    JPEG decode takes) and gray-source PNG passthrough; inputs whose
    conversion would differ (color PNGs: libpng-default vs cv2's
    BT.601 coefficients) decline to cv2 — tests/test_native_decode.py
    pins the parity."""
    if channels == 3:
        return load_image_rgb(path)
    if channels != 1:
        raise ValueError(f"channels={channels}: darknet image loading "
                         f"supports 1 (grayscale) or 3 (RGB)")
    if _DECODER == "native":
        from yolo_tpu.native.preproc import decode_image

        img = decode_image(path, channels=1)
        if img is not None:
            return img
        # parity declines / uncovered formats fall through to cv2
    return _load_image_cv2_gray(path)


def letterbox_boxes(boxes_xywh: np.ndarray, src_w: int, src_h: int,
                    net_size) -> np.ndarray:
    """Transform normalized source-image xywh boxes into net-space
    normalized xywh after letterboxing (same geometry as ops/letterbox).
    net_size: int or (net_h, net_w) — x/w normalize through net_w,
    y/h through net_h."""
    from yolo_tpu.ops.letterbox import as_hw, letterbox_geometry

    net_h, net_w = as_hw(net_size)
    scale, rh, rw, px, py = letterbox_geometry(src_h, src_w, net_size)
    b = np.asarray(boxes_xywh, np.float32).copy()
    out = np.empty_like(b)
    out[:, 0] = (b[:, 0] * src_w * scale + px) / net_w
    out[:, 1] = (b[:, 1] * src_h * scale + py) / net_h
    out[:, 2] = b[:, 2] * src_w * scale / net_w
    out[:, 3] = b[:, 3] * src_h * scale / net_h
    return out


class DevicePrefetcher:
    """Wrap a host-batch iterator; keeps ``depth`` batches resident on
    device ahead of the consumer (double buffering at depth=2)."""

    def __init__(self, host_iter: Iterable, depth: int = 2, sharding=None):
        import jax

        self._q: queue_mod.Queue = queue_mod.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None

        def put(batch):
            def stage(a):
                if not isinstance(a, (np.ndarray, np.generic)):
                    return a  # metadata (paths, pad counts) stays on host
                return (jax.device_put(a, sharding) if sharding is not None
                        else jax.device_put(a))

            self._q.put(jax.tree_util.tree_map(stage, batch))

        def worker():
            try:
                for batch in host_iter:
                    put(batch)
            except BaseException as e:  # surfaced on next()
                self._err = e
            finally:
                self._q.put(None)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self) -> Iterator:
        while True:
            item = self._q.get()
            if item is None:
                if self._err is not None:
                    raise self._err
                return
            yield item


def inference_batches(image_paths: Sequence[str], batch_size: int,
                      workers: int = 8,
                      net_size=None,
                      skip_errors: bool = True,
                      resize: str = "letterbox",
                      channels: int = 3) -> Iterator[Dict]:
    """Decode images in parallel and yield inference batches.

    net_size=None (device-preprocess mode): raw-RGB batches bucketed by
    source shape — each distinct shape is one jit specialization; right
    for homogeneous streams (cameras, video).

    net_size=<int or (net_h, net_w)> (host-preprocess mode): images are preprocessed on
    the host to one uniform (net, net) float32 shape — letterboxed
    (native C++ path) or, with resize="stretch", plain-resized
    (AlexeyAB geometry) — so heterogeneous directories (e.g. VOC)
    compile exactly ONE program; batches carry per-image source shapes
    for the matching box un-mapping (unletterbox_boxes /
    unstretch_boxes)."""
    import collections

    if (net_size is not None and resize == "letterbox"
            and _DECODER == "native" and channels in (1, 3)):
        from yolo_tpu.native import preproc as native_pp

        if native_pp.available():
            yield from _native_inference_batches(
                image_paths, batch_size, net_size, workers, skip_errors,
                channels)
            return

    with cf.ThreadPoolExecutor(workers) as pool:
        # bounded submission: at most ~4 batches of decodes in flight so a
        # slow consumer doesn't buffer the whole dataset's pixels
        paths_iter = iter(image_paths)
        inflight: collections.deque = collections.deque()

        def load(q):
            try:
                img = load_image(q, channels)
            except (FileNotFoundError, OSError) as e:
                if skip_errors:
                    import sys

                    print(f"skipping {q}: {e}", file=sys.stderr)
                    return None
                raise
            if net_size is not None:
                # preprocess inside the pooled task so the host path
                # parallelizes like the decode itself
                if resize == "stretch":
                    from yolo_tpu.ops.letterbox import as_hw
                    from yolo_tpu.ops.numpy_ref import stretch_resize

                    nh, nw = as_hw(net_size)
                    return q, img.shape[:2], stretch_resize(
                        img, nw, nh)
                from yolo_tpu.native.preproc import letterbox_batch

                return q, img.shape[:2], letterbox_batch(
                    img[None], net_size, n_threads=1)[0]
            return q, img

        def refill():
            while len(inflight) < max(workers, batch_size) * 4:
                p = next(paths_iter, None)
                if p is None:
                    return
                inflight.append(pool.submit(load, p))

        def decoded():
            refill()
            while inflight:
                item = inflight.popleft().result()
                refill()
                if item is not None:
                    yield item

        if net_size is not None:
            chunk: List = []
            for item in decoded():
                chunk.append(item)
                if len(chunk) == batch_size:
                    yield _assemble_preprocessed(chunk, 0)
                    chunk = []
            if chunk:
                yield _assemble_preprocessed(chunk, batch_size - len(chunk))
            return

        buckets: Dict[Tuple[int, int], List] = {}
        for path, img in decoded():
            key = img.shape[:2]
            buckets.setdefault(key, []).append((path, img))
            if len(buckets[key]) == batch_size:
                items = buckets.pop(key)
                yield {"images": np.stack([im for _, im in items]),
                       "paths": [p for p, _ in items]}
        for key, items in buckets.items():
            # pad the remainder to batch_size to reuse the compiled graph
            pad = batch_size - len(items)
            images = np.stack([im for _, im in items] +
                              [items[-1][1]] * pad)
            yield {"images": images,
                   "paths": [p for p, _ in items],
                   "pad": pad}


def _native_inference_batches(image_paths, batch_size: int, net_size,
                              workers: int, skip_errors: bool,
                              channels: int = 3):
    """Fused host-preprocess path: ONE native decode->letterbox C++
    call per batch (native/decode.cpp worker threads — the darknet
    data.c loader role), double-buffered so the next batch decodes
    while the device consumes the current one. Failed slots (formats
    the native decoder doesn't cover, parity declines — e.g. color
    PNGs at channels=1 — corrupt files) retry on the cv2 path;
    identical batch/pad semantics to the Python host path."""
    import sys

    from yolo_tpu.native import preproc as native_pp

    def load_chunk(chunk):
        out, dims, ok = native_pp.decode_letterbox_batch(
            chunk, net_size, n_threads=workers, channels=channels)
        items = []
        for i, p in enumerate(chunk):
            if ok[i]:
                items.append((p, (int(dims[i, 0]), int(dims[i, 1])),
                              out[i]))
                continue
            try:
                # go STRAIGHT to cv2: the native decoder just declined
                # this slot, so load_image would re-attempt (and
                # re-decline) the same native decode first
                img = (_load_image_cv2_gray(p) if channels == 1
                       else _load_image_cv2(p))
            except (FileNotFoundError, OSError) as e:
                if skip_errors:
                    print(f"skipping {p}: {e}", file=sys.stderr)
                    continue
                raise
            items.append((p, img.shape[:2], native_pp.letterbox_batch(
                img[None], net_size, n_threads=1)[0]))
        return items

    paths = list(image_paths)
    with cf.ThreadPoolExecutor(1) as pool:
        chunks = [paths[i:i + batch_size]
                  for i in range(0, len(paths), batch_size)]
        futures = [pool.submit(load_chunk, c) for c in chunks[:2]]
        nxt = 2
        leftover: List = []
        while futures:
            items = futures.pop(0).result()
            if nxt < len(chunks):
                futures.append(pool.submit(load_chunk, chunks[nxt]))
                nxt += 1
            leftover.extend(items)
            while len(leftover) >= batch_size:
                yield _assemble_preprocessed(leftover[:batch_size], 0)
                leftover = leftover[batch_size:]
        if leftover:
            yield _assemble_preprocessed(
                leftover, batch_size - len(leftover))


def _assemble_preprocessed(chunk, pad: int) -> Dict:
    """chunk items: (path, src_shape, letterboxed_image)."""
    images = [img for _, _, img in chunk]
    images += [images[-1]] * pad
    out = {"images": np.stack(images),
           "paths": [p for p, _, _ in chunk],
           "shapes": [s for _, s, _ in chunk]}
    if pad:
        out["pad"] = pad
    return out


def train_batches(pairs: Sequence[Tuple[str, str]], *, class_names,
                  anchors, num_classes: int, net_size, batch_size: int,
                  rng: np.random.Generator, workers: int = 8,
                  shuffle: bool = True, size_for_batch=None,
                  augment_cfg=None, model_cfg=None,
                  resize: str = "letterbox",
                  channels: int = 3) -> Iterator[Dict]:
    """(image, annotation) pairs -> fixed-shape train batches: letterboxed
    images in [0,1] + encoded GT targets (data/targets.py). One epoch.
    The annotation may be a VOC XML path (str) or a pre-parsed dict in
    `voc.parse_annotation`'s schema (e.g. from `coco.load_coco`).

    ``size_for_batch(batch_idx) -> int|None`` enables darknet-style
    multi-scale switching (new net size every N batches; each distinct
    size is one jit bucket, SURVEY.md §5.7). ``augment_cfg`` (an
    data.augment.AugmentConfig) enables darknet-style jitter/flip/HSV
    augmentation per sample. ``resize="stretch"`` trains with
    AlexeyAB's plain-resize geometry (its letter_box=0 default —
    normalized xywh boxes are stretch-invariant, so only the image
    transform changes); mosaic composes its own canvas and is
    unaffected by the mode (as in darknet)."""
    from yolo_tpu.data.voc import parse_annotation

    order = np.arange(len(pairs))
    if shuffle:
        rng.shuffle(order)
    n_batches = len(order) // batch_size  # drop remainder: fixed shapes
    if n_batches == 0:
        # the classifier loader raises for this; silently yielding
        # zero batches 'completes' a training run that trained
        # nothing (code-review finding)
        raise ValueError(f"dataset has {len(pairs)} images but "
                         f"batch={batch_size} — need at least one "
                         f"full batch")
    aug_base = int(rng.integers(0, 2 ** 31))  # per-sample thread-safe rngs
    # name-mismatch tripwire: objects whose XML name is outside the
    # model's class list silently become background (correct for a few
    # stray labels, catastrophic when --names is wrong and EVERY box
    # drops) — warn once if the first batches keep nothing while the
    # annotations did contain objects
    drop_stats = {"kept": 0, "unknown": 0, "warned": False}

    def load_sample(idx: int, rng_key):
        """Raw augmented (img, boxes, classes) for one dataset index."""
        img_path, ann = pairs[int(idx)]
        img = load_image(img_path, channels)
        if isinstance(ann, dict):
            # pre-parsed (COCO path): drop crowd/difficult boxes from the
            # training targets, matching parse_annotation's default
            keep = np.asarray(ann["difficult"]) == 0
            boxes, classes = ann["boxes"][keep], ann["classes"][keep]
        else:
            ann = parse_annotation(ann, class_names)
            boxes, classes = ann["boxes"], ann["classes"]
            drop_stats["kept"] += len(classes)
            drop_stats["unknown"] += ann.get("n_unknown", 0)
        if augment_cfg is not None:
            from yolo_tpu.data.augment import augment

            img, boxes, classes = augment(
                img, boxes, classes, np.random.default_rng(rng_key),
                augment_cfg)
        return img, boxes, classes

    def prepare(idx: int, size: int):
        from yolo_tpu.native.preproc import letterbox_batch as native_letterbox

        if augment_cfg is not None and augment_cfg.mosaic:
            from yolo_tpu.data.augment import mosaic4

            rng_m = np.random.default_rng((aug_base, int(idx), 4))
            picks = [int(idx)] + [int(order[rng_m.integers(0, len(order))])
                                  for _ in range(3)]
            samples = [load_sample(i, (aug_base, int(idx), k))
                       for k, i in enumerate(picks)]
            canvas, boxes, classes = mosaic4(samples, size, rng_m,
                                             augment_cfg)
            return canvas.astype(np.float32) / 255.0, boxes, classes
        def geom(idx_, key):
            """One sample through the full geometry -> net-space
            (img_float, boxes, classes)."""
            img, boxes, classes = load_sample(idx_, key)
            h, w = img.shape[:2]
            if resize == "stretch":
                from yolo_tpu.ops.letterbox import as_hw
                from yolo_tpu.ops.numpy_ref import stretch_resize

                nh, nw = as_hw(size)
                # plain resize: normalized boxes need no transform
                return stretch_resize(img, nw, nh), boxes, classes
            # native C++ letterbox (oracle semantics; numpy fallback)
            image = native_letterbox(img[None], size, n_threads=1)[0]
            return image, letterbox_boxes(boxes, w, h, size), classes

        if augment_cfg is not None and augment_cfg.mixup:
            # AlexeyAB mixup=1: 0.5/0.5 blend with a second random
            # sample (blend_images_cv), truths concatenated — applied
            # after geometry so both live in the same net space
            rng_x = np.random.default_rng((aug_base, int(idx), 2))
            other = int(order[rng_x.integers(0, len(order))])
            img_a, box_a, cls_a = geom(idx, (aug_base, int(idx)))
            img_b, box_b, cls_b = geom(other, (aug_base, int(idx), 3))
            image = 0.5 * img_a + 0.5 * img_b
            boxes = (np.concatenate([box_a, box_b])
                     if len(box_a) or len(box_b) else box_a)
            classes = (np.concatenate([cls_a, cls_b])
                       if len(cls_a) or len(cls_b) else cls_a)
            return image, boxes, classes
        return geom(idx, (aug_base, int(idx)))

    size = net_size
    with cf.ThreadPoolExecutor(workers) as pool:
        for bi in range(n_batches):
            if size_for_batch is not None:
                size = size_for_batch(bi) or size
            idxs = order[bi * batch_size:(bi + 1) * batch_size]
            chunk = list(pool.map(lambda i: prepare(i, size), idxs))
            if (not drop_stats["warned"] and drop_stats["kept"] == 0
                    and drop_stats["unknown"] > 0):
                import sys

                drop_stats["warned"] = True
                print(
                    f"WARNING: the first {drop_stats['unknown']} "
                    "annotated objects were ALL dropped because their "
                    "class names are not in the model's class list — "
                    "training would see only background. Check --names "
                    "(or the cfg's class names) against the dataset.",
                    file=sys.stderr)
            yield _assemble(chunk, size, anchors, num_classes, model_cfg)


def _assemble(chunk, size, anchors, num_classes, model_cfg=None) -> Dict:
    """Stack one batch + encode GT. ``model_cfg`` enables head-kind
    dispatch (yolov3 multi-head targets); the legacy (anchors,
    num_classes) pair encodes the region head."""
    from yolo_tpu.data import targets as tgt

    images = np.stack([c[0] for c in chunk])
    boxes, classes = [c[1] for c in chunk], [c[2] for c in chunk]
    nh, nw = tgt._as_hw(size)
    if model_cfg is not None:
        enc = tgt.encode_batch_for(model_cfg, boxes, classes,
                                   input_size=(nh, nw))
    else:
        enc = tgt.encode_batch(boxes, classes,
                               grid=(nh // 32, nw // 32),
                               anchors=anchors, num_classes=num_classes)
    enc["images"] = images
    return enc
