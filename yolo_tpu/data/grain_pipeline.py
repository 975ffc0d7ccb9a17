"""grain-backed training data pipeline (SURVEY.md §5.2: 'guard the only
mutable host state with grain's tested executor rather than hand-rolled
threading'; §3.3 batched train feed).

An alternative to `pipeline.train_batches` for production hosts:
 * deterministic global shuffle per epoch (IndexSampler, seeded);
 * real multiprocess workers (`worker_count`) — the thread loader is
   GIL-bound for the pure-Python XML/GT-encode portion;
 * darknet augmentation (jitter/flip/HSV) via grain's seeded
   RandomMapTransform — deterministic AND restart-safe (the rng travels
   with the iterator state);
 * a checkpointable iterator: `grain_train_batches` returns a
   `CheckpointableGrainIterator` whose get_state/set_state wrap grain's
   native iterator checkpointing, with a small state history so the
   position of the last CONSUMED batch can be saved even when a
   DevicePrefetcher has pulled ahead. `cli train --loader grain
   --checkpoint-dir d` writes `<ckpt>.grain` next to each orbax
   checkpoint and `--resume` restores both together.

Multi-scale IS supported (round 5 — the former fixed-net-size
exclusion is closed): grain's per-record operations can't change shape
per step, but the SAMPLER position is independent of the operations,
so `MultiScaleGrainIterator` keeps one DataLoader per size bucket and
carries the position across resize boundaries via grain's own iterator
state (restored state validates against source+sampler only). The size
ladder must be random-access deterministic
(`train/loop.pick_scale_indexed`) so resume rebuilds any step's bucket
directly. Mosaic and mixup are supported too: the data source is
random-access, so
the seeded per-record transform draws its partner records itself
(_prepare) — deterministic and restart-safe like every other grain
augmentation. `cli train --loader grain` selects it.
"""

from __future__ import annotations

import collections
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np


def _load_raw(sample, *, class_names, augment_cfg=None, rng=None,
              channels: int = 3):
    """(image_path, annotation) -> raw augmented (img_u8, boxes,
    classes) — the per-sample half shared by the plain, mosaic, and
    mixup paths."""
    from yolo_tpu.data.pipeline import load_image
    from yolo_tpu.data.voc import parse_annotation

    img_path, ann = sample
    img = load_image(img_path, channels)
    if isinstance(ann, dict):
        keep = np.asarray(ann["difficult"]) == 0
        boxes, classes = ann["boxes"][keep], ann["classes"][keep]
    else:
        ann = parse_annotation(ann, class_names)
        boxes, classes = ann["boxes"], ann["classes"]
    if augment_cfg is not None:
        from yolo_tpu.data.augment import augment

        img, boxes, classes = augment(img, boxes, classes, rng,
                                      augment_cfg)
    return img, boxes, classes


def _prepare(sample, *, class_names, anchors, num_classes, net_size,
             model_cfg=None, augment_cfg=None, rng=None,
             resize="letterbox", all_pairs=None, channels: int = 3):
    """(image_path, annotation) -> one fixed-shape training record.

    Mosaic/mixup under grain (cross-record augmentation): the data
    source is RANDOM-ACCESS (a plain list), so the seeded per-record
    rng draws the 3 (resp. 1) partner indices deterministically from
    ``all_pairs`` and the transform loads them itself — restart-safe
    because the rng travels with grain's iterator state, exactly like
    the single-record augmentations."""
    from yolo_tpu.data import targets as tgt
    from yolo_tpu.data.pipeline import letterbox_boxes
    from yolo_tpu.native.preproc import letterbox_batch

    from yolo_tpu.data.targets import _as_hw

    nh, nw = _as_hw(net_size)

    def geometry(img, boxes):
        """source-space (img_u8, boxes) -> net-space (float img, boxes)."""
        h, w = img.shape[:2]
        if resize == "stretch":
            # AlexeyAB letter_box=0: normalized boxes unchanged
            from yolo_tpu.ops.numpy_ref import stretch_resize

            return stretch_resize(img, nw, nh), boxes
        image = letterbox_batch(img[None], (nh, nw), n_threads=1)[0]
        return image, letterbox_boxes(boxes, w, h, (nh, nw))

    if augment_cfg is not None and augment_cfg.mosaic:
        from yolo_tpu.data.augment import mosaic4

        picks = [sample] + [all_pairs[int(rng.integers(len(all_pairs)))]
                            for _ in range(3)]
        samples = [_load_raw(p, class_names=class_names,
                             augment_cfg=augment_cfg, rng=rng,
                             channels=channels)
                   for p in picks]
        canvas, boxes, classes = mosaic4(samples, (nh, nw), rng,
                                         augment_cfg)
        image = canvas.astype(np.float32) / 255.0
    elif augment_cfg is not None and augment_cfg.mixup:
        # AlexeyAB mixup=1: 0.5/0.5 blend with one random partner
        # (blend_images_cv), truths concatenated — blended AFTER the
        # geometry so both live in the same net space (the thread
        # loader's convention, data/pipeline.py)
        other = all_pairs[int(rng.integers(len(all_pairs)))]
        img_a, box_a, cls_a = _load_raw(sample, class_names=class_names,
                                        augment_cfg=augment_cfg, rng=rng,
                             channels=channels)
        img_b, box_b, cls_b = _load_raw(other, class_names=class_names,
                                        augment_cfg=augment_cfg, rng=rng,
                             channels=channels)
        im_a, box_a = geometry(img_a, box_a)
        im_b, box_b = geometry(img_b, box_b)
        image = 0.5 * im_a + 0.5 * im_b
        boxes = (np.concatenate([box_a, box_b])
                 if len(box_a) or len(box_b) else box_a)
        classes = (np.concatenate([cls_a, cls_b])
                   if len(cls_a) or len(cls_b) else cls_a)
    else:
        img, boxes, classes = _load_raw(sample, class_names=class_names,
                                        augment_cfg=augment_cfg, rng=rng,
                             channels=channels)
        image, boxes = geometry(img, boxes)
    if model_cfg is not None:
        enc = tgt.encode_for(model_cfg, boxes, classes,
                             input_size=(nh, nw))
    else:
        enc = tgt.encode(boxes, classes, grid=(nh // 32, nw // 32),
                         anchors=anchors, num_classes=num_classes)
    enc["images"] = image
    return enc


class CheckpointableGrainIterator:
    """Iterator over grain batches with checkpoint/resume support.

    Wraps grain's PyGrainDatasetIterator. Before every pull it records
    (pull_index, iterator_state); `state_for_pull(k)` returns the state
    that, when restored via `set_state`, reproduces batch k onward.
    This matters behind a prefetcher: when the training loop has
    CONSUMED n batches, the underlying iterator has already been pulled
    n+depth times — checkpointing `state_for_pull(n)` resumes exactly
    after the last trained batch, losing nothing to the prefetch queue.
    """

    def __init__(self, it, history: int = 16):
        import threading

        self._it = it
        self._states = collections.deque(maxlen=history)
        self._pulls = 0
        # a DevicePrefetcher pulls from a background thread while the
        # training loop checkpoints from the main thread — serialize
        # next() against the state accessors (grain iterators are not
        # thread-safe for concurrent get_state + next)
        self._lock = threading.Lock()

    def __iter__(self):
        return self

    def __next__(self):
        with self._lock:
            self._states.append((self._pulls, self._it.get_state()))
            self._pulls += 1
            return next(self._it)

    @property
    def pulls(self) -> int:
        return self._pulls

    def state_for_pull(self, k: int) -> bytes:
        """State that regenerates batch k onward (k = batches consumed
        since construction or the last set_state). Only the most recent
        `history` pull states are kept — enough for any sane prefetch
        depth."""
        with self._lock:
            if k == self._pulls:  # checkpoint at the exact frontier
                return self._it.get_state()
            return self._history_state_locked(k)

    def _history_state_locked(self, k: int) -> bytes:
        """Recorded pre-pull state for batch k (lock held by caller) —
        shared with MultiScaleGrainIterator's override."""
        for i, s in self._states:
            if i == k:
                return s
        raise KeyError(
            f"no recorded state for pull {k} (have "
            f"{[i for i, _ in self._states]}; history too short or "
            f"batch already evicted)")

    def get_state(self) -> bytes:
        with self._lock:
            return self._it.get_state()

    def set_state(self, state: bytes) -> None:
        with self._lock:
            self._it.set_state(state)
            # history predating the restore is meaningless, and pull
            # counting restarts: state_for_pull(k) is defined as
            # "k batches consumed since the last restore (or since
            # construction)" — without the reset, a mid-run restore
            # desyncs pull indices from the caller's consumed count
            self._states.clear()
            self._pulls = 0


class MultiScaleGrainIterator(CheckpointableGrainIterator):
    """Multi-scale training under grain (closes the round-4 exclusion
    in docs/MIGRATING.md): one DataLoader PER SIZE BUCKET, sharing a
    single logical sampler position that is carried across buckets via
    grain's native iterator state.

    Why this is sound: grain validates a restored state against the
    data source's repr and the sampler configuration — NOT against the
    per-record operations — and every bucket here differs only in the
    transform's net_size. Transferring get_state() from bucket A into
    bucket B therefore continues the exact shuffled record sequence
    with a different output shape (verified by
    tests/test_grain.py::test_multi_scale_state_transfers and the
    equivalence test against a fixed-size run).

    ``size_at(absolute_batch_index) -> net size`` must be
    random-access deterministic (pick_scale_indexed): on resume the
    CLI restores the data position with set_state and sets ``base`` to
    the resumed step, and the next pull rebuilds that step's bucket
    directly — reproducing the interrupted run's size ladder exactly.

    Per-bucket iterators are cached, so with worker processes each
    bucket's workers spawn once and persize switches are just a
    set_state. The checkpoint surface (get_state/set_state/
    state_for_pull) is inherited unchanged: states are
    bucket-agnostic by the same validation argument."""

    # bound on cached per-size iterators: each may hold a live worker
    # pool (worker_count>0), so the full 10-size darknet ladder must
    # not keep 10 pools alive; an evicted bucket is simply rebuilt on
    # re-entry (position still carries via state) — code-review r5
    _MAX_CACHED = 4

    def __init__(self, make_iter, size_at, net_size=None, history=16):
        self._make = make_iter
        self._size_at = size_at
        self.base = 0            # absolute index of pull 0 (resume)
        self._net_size = net_size
        self._cache = collections.OrderedDict()
        self._size = None        # buckets build LAZILY: a resume that
        self._pending_state = None   # starts mid-ladder never builds
        super().__init__(None, history)  # the step-0 bucket at all

    @property
    def current_size(self):
        return self._size

    def _bucket(self, size):
        """The (cached) iterator for a size, LRU-bounded."""
        key = _size_key(size)
        it = self._cache.get(key)
        if it is None:
            it = self._make(size)
            self._cache[key] = it
            if len(self._cache) > self._MAX_CACHED:
                self._cache.popitem(last=False)
        else:
            self._cache.move_to_end(key)
        return it

    def _ensure_locked(self, size=None):
        """Build the first bucket on demand (and apply a state that
        was restored before any pull)."""
        if self._it is not None:
            return
        if size is None:
            size = self._size_at(self.base)
            if size is None:
                size = self._net_size
        self._it = self._bucket(size)
        self._size = size
        if self._pending_state is not None:
            self._it.set_state(self._pending_state)
            self._pending_state = None

    def __next__(self):
        with self._lock:
            size = self._size_at(self.base + self._pulls)
            if size is None:
                size = (self._size if self._size is not None
                        else self._net_size)
            if self._it is None:
                self._ensure_locked(size)
            elif _size_key(size) != _size_key(self._size):
                st = self._it.get_state()
                nxt = self._bucket(size)
                nxt.set_state(st)       # position carries across
                self._it = nxt
                self._size = size
            self._states.append((self._pulls, self._it.get_state()))
            self._pulls += 1
            return next(self._it)

    def get_state(self) -> bytes:
        with self._lock:
            if self._it is None and self._pending_state is not None:
                return self._pending_state
            self._ensure_locked()
            return self._it.get_state()

    def set_state(self, state: bytes) -> None:
        with self._lock:
            if self._it is None:
                # applied when the first pull picks its bucket — no
                # bucket is built just to hold a restored position
                self._pending_state = state
            else:
                self._it.set_state(state)
            self._states.clear()
            self._pulls = 0

    def state_for_pull(self, k: int) -> bytes:
        with self._lock:
            if k == self._pulls:        # the exact frontier
                if self._it is None and self._pending_state is not None:
                    return self._pending_state
                self._ensure_locked()
                return self._it.get_state()
            return self._history_state_locked(k)


def _size_key(size):
    """int and (h, w) sizes hash uniformly (416 == (416, 416))."""
    from yolo_tpu.data.targets import _as_hw

    return _as_hw(size)


def grain_train_batches(pairs: Sequence[Tuple[str, object]], *,
                        class_names, anchors, num_classes: int,
                        net_size, batch_size: int, seed: int = 0,
                        num_epochs: Optional[int] = 1,
                        worker_count: int = 0, model_cfg=None,
                        augment_cfg=None,
                        resize: str = "letterbox",
                        channels: int = 3,
                        size_for_batch=None
                        ) -> CheckpointableGrainIterator:
    """Yield train batches with the same schema as
    `pipeline.train_batches` via a grain DataLoader.

    worker_count=0 runs in-process (tests / 1-core boxes); >0 spawns
    real worker processes — standard multiprocessing rules apply (the
    entry script must be importable: a real file with an
    `if __name__ == "__main__"` guard, not stdin/REPL).
    num_epochs=None repeats forever. augment_cfg enables darknet
    jitter/flip/HSV per record, plus mosaic/mixup via seeded
    random-access partner draws (see _prepare).

    size_for_batch (absolute batch index -> net size) enables
    darknet-style multi-scale: MUST be random-access deterministic
    (train/loop.pick_scale_indexed) so a resumed run rebuilds the
    bucket for any step directly. Returns a MultiScaleGrainIterator
    (same checkpoint surface) which re-instantiates the bucketed
    DataLoader at resize boundaries and carries the iterator position
    across via grain's own state.
    """
    import grain.python as gp

    class _Source:
        def __init__(self, pairs):
            self._pairs = list(pairs)

        def __len__(self):
            return len(self._pairs)

        def __getitem__(self, i):
            return self._pairs[int(i)]

        def __repr__(self):
            # grain validates checkpoints against repr(data_source):
            # make it content-derived (stable across processes, and a
            # DIFFERENT dataset is correctly rejected on restore)
            import hashlib

            h = hashlib.sha256()
            for p, _ in self._pairs:
                # NUL-terminate each path: separator-free
                # concatenation lets boundary-shifted path lists
                # collide (code-review finding)
                h.update(str(p).encode() + b"\0")
            return (f"yolo_tpu._Source(n={len(self._pairs)}, "
                    f"paths_sha={h.hexdigest()[:16]})")

    def build(size):
        """One DataLoader for net size ``size``. Every bucket shares
        the data source (content-derived repr) and the sampler
        (seed/num_epochs), so grain iterator STATE is interchangeable
        across buckets — the property the multi-scale iterator rides
        (grain validates state against source+sampler, not the
        per-record operations; pinned by
        tests/test_grain.py::test_multi_scale_state_transfers)."""
        kw = dict(class_names=class_names,
                  anchors=np.asarray(anchors, np.float32),
                  num_classes=num_classes, net_size=size,
                  model_cfg=model_cfg, resize=resize, channels=channels)
        if augment_cfg is not None and (augment_cfg.mosaic
                                        or augment_cfg.mixup):
            # cross-record augmentation: the transform draws partner
            # records itself from the random-access pair list (_prepare)
            kw["all_pairs"] = list(pairs)

        class _Prepare(gp.MapTransform):
            def map(self, sample):
                return _prepare(sample, **kw)

        class _PrepareAugmented(gp.RandomMapTransform):
            def random_map(self, sample, rng):
                return _prepare(sample, augment_cfg=augment_cfg,
                                rng=rng, **kw)

        prepare = (_Prepare() if augment_cfg is None
                   else _PrepareAugmented())
        sampler = gp.IndexSampler(
            num_records=len(pairs), shard_options=gp.NoSharding(),
            shuffle=True, num_epochs=num_epochs, seed=seed)
        loader = gp.DataLoader(
            data_source=_Source(pairs),
            sampler=sampler,
            operations=[prepare,
                        gp.Batch(batch_size=batch_size,
                                 drop_remainder=True)],
            worker_count=worker_count,
        )
        return iter(loader)

    if size_for_batch is not None:
        return MultiScaleGrainIterator(build, size_for_batch,
                                       net_size=net_size)
    return CheckpointableGrainIterator(build(net_size))
