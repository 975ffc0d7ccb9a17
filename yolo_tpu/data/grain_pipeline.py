"""grain-backed training data pipeline (SURVEY.md §5.2: 'guard the only
mutable host state with grain's tested executor rather than hand-rolled
threading'; §3.3 batched train feed).

An alternative to `pipeline.train_batches` for production hosts:
 * deterministic global shuffle per epoch (IndexSampler, seeded);
 * real multiprocess workers (`worker_count`) — the thread loader is
   GIL-bound for the pure-Python XML/GT-encode portion;
 * a checkpointable iterator (grain's PyGrainCheckpointHandler) so the
   data position can resume with the model state.

Constraints vs the thread loader (documented, enforced): fixed net
size only (multi-scale changes batch shapes per step, which grain's
per-record operations can't express) and no darknet augmentation hook
yet. `cli train --loader grain` selects it.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence, Tuple

import numpy as np


def _prepare(sample, *, class_names, anchors, num_classes, net_size,
             model_cfg=None):
    """(image_path, annotation) -> one fixed-shape training record."""
    from yolo_tpu.data import targets as tgt
    from yolo_tpu.data.pipeline import letterbox_boxes, load_image_rgb
    from yolo_tpu.data.voc import parse_annotation
    from yolo_tpu.native.preproc import letterbox_batch

    img_path, ann = sample
    img = load_image_rgb(img_path)
    if isinstance(ann, dict):
        keep = np.asarray(ann["difficult"]) == 0
        boxes, classes = ann["boxes"][keep], ann["classes"][keep]
    else:
        ann = parse_annotation(ann, class_names)
        boxes, classes = ann["boxes"], ann["classes"]
    h, w = img.shape[:2]
    image = letterbox_batch(img[None], net_size, n_threads=1)[0]
    boxes = letterbox_boxes(boxes, w, h, net_size)
    if model_cfg is not None:
        enc = tgt.encode_for(model_cfg, boxes, classes,
                             input_size=net_size)
    else:
        enc = tgt.encode(boxes, classes, grid=net_size // 32,
                         anchors=anchors, num_classes=num_classes)
    enc["images"] = image
    return enc


def grain_train_batches(pairs: Sequence[Tuple[str, object]], *,
                        class_names, anchors, num_classes: int,
                        net_size: int, batch_size: int, seed: int = 0,
                        num_epochs: Optional[int] = 1,
                        worker_count: int = 0, model_cfg=None) -> Iterator:
    """Yield train batches with the same schema as
    `pipeline.train_batches` via a grain DataLoader.

    worker_count=0 runs in-process (tests / 1-core boxes); >0 spawns
    real worker processes — standard multiprocessing rules apply (the
    entry script must be importable: a real file with an
    `if __name__ == "__main__"` guard, not stdin/REPL).
    num_epochs=None repeats forever.
    """
    import functools

    import grain.python as gp

    class _Source:
        def __init__(self, pairs):
            self._pairs = list(pairs)

        def __len__(self):
            return len(self._pairs)

        def __getitem__(self, i):
            return self._pairs[int(i)]

    class _Prepare(gp.MapTransform):
        def map(self, sample):
            return _prepare(sample, class_names=class_names,
                            anchors=np.asarray(anchors, np.float32),
                            num_classes=num_classes, net_size=net_size,
                            model_cfg=model_cfg)

    sampler = gp.IndexSampler(
        num_records=len(pairs), shard_options=gp.NoSharding(),
        shuffle=True, num_epochs=num_epochs, seed=seed)
    loader = gp.DataLoader(
        data_source=_Source(pairs),
        sampler=sampler,
        operations=[_Prepare(),
                    gp.Batch(batch_size=batch_size,
                             drop_remainder=True)],
        worker_count=worker_count,
    )
    return iter(loader)
