"""Imagefolder classifier datasets: ``<root>/<class_name>/<image>``
(the layout `cli classify --images` evaluates and `cli train` consumes
for softmax-head models — darknet's classifier train/valid list files
express the same mapping as paths + label names).

Training batches use darknet's deterministic inference geometry
(resize_min + center crop, models/classify.classifier_preprocess) plus
a seeded horizontal flip and, with an AugmentConfig, the SAME pinned
HSV distortion the detector pipeline trains with (data/augment.py
rand_scale/hue math). When the cfg activates [net]
angle/aspect/min_crop/max_crop, darknet's classifier scale/rotation
jitter (data.c random_augment_image) replaces the deterministic
geometry (data/augment.random_augment_classifier — darknet-style:
exact inverse-map geometry, cv2 bilinear resampling).
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Sequence, Tuple

import numpy as np

IMAGE_EXTS = {".jpg", ".jpeg", ".png", ".bmp"}


def list_imagefolder(root: str, class_names: Sequence[str]
                     ) -> List[Tuple[str, int]]:
    """(path, class_idx) samples; every subdirectory must be a known
    class name (fail loudly on a stray directory — a typo'd class would
    otherwise silently vanish from the dataset)."""
    name_to_idx = {n: i for i, n in enumerate(class_names)}
    samples: List[Tuple[str, int]] = []
    for sub in sorted(os.listdir(root)):
        subdir = os.path.join(root, sub)
        if not os.path.isdir(subdir):
            continue
        if sub not in name_to_idx:
            raise ValueError(
                f"directory '{sub}' is not a class name of this model "
                f"(imagefolder layout: one subdirectory per class; pass "
                f"--names for custom label sets)")
        samples += [(os.path.join(subdir, f), name_to_idx[sub])
                    for f in sorted(os.listdir(subdir))
                    if os.path.splitext(f)[1].lower() in IMAGE_EXTS]
    if not samples:
        raise ValueError(f"no images under {root} "
                         f"(expected <dir>/<class>/<image> layout)")
    return samples


def steps_per_epoch(n_samples: int, batch: int) -> int:
    """Batches yielded per epoch (the trailing partial batch wraps)."""
    return -(-n_samples // batch)


def classifier_train_batches(samples: Sequence[Tuple[str, int]],
                             batch: int, net_size, *,
                             epochs: int = 1, seed: int = 0,
                             flip: bool = True, start_step: int = 0,
                             augment_cfg=None, channels: int = 3
                             ) -> Iterator[Dict[str, np.ndarray]]:
    """Shuffled epochs of {"images" (B, net, net, 3) f32 [0,1],
    "labels" (B,) i32}. The trailing partial batch of each epoch WRAPS
    with the epoch's leading samples (static batch shape keeps one jit
    bucket; every sample is seen each epoch).

    Randomness is POSITION-INDEPENDENT — the epoch's shuffle order and
    per-sample flips derive from (seed, epoch) alone, never from how
    many batches were consumed — so ``start_step`` resumes the exact
    stream a crashed run would have produced next (cli train --resume
    restores the data position together with the model state, the
    imagefolder counterpart of the grain data-position resume).

    augment_cfg (data.augment.AugmentConfig) applies darknet's HSV
    distortion (the SAME pinned rand_scale/hue math the detector
    pipeline uses) to the raw image before the preprocess, with
    per-(epoch, sample) keys — also position-independent. Its flip
    field overrides ``flip``."""
    from yolo_tpu.data.pipeline import load_image
    from yolo_tpu.models.classify import classifier_preprocess

    if batch < 1:
        raise ValueError(f"batch must be >= 1, got {batch}")
    if len(samples) < batch:
        raise ValueError(f"dataset has {len(samples)} images but "
                         f"batch={batch} — need at least one full batch")
    spe = steps_per_epoch(len(samples), batch)
    first_epoch, skip_batches = divmod(start_step, spe)
    if augment_cfg is not None:
        flip = augment_cfg.flip
    for epoch in range(first_epoch, epochs):
        order = np.random.default_rng(
            (seed, 1, epoch)).permutation(len(samples))
        flips = (np.random.default_rng(
            (seed, 2, epoch)).random(len(samples)) < 0.5)
        start = skip_batches if epoch == first_epoch else 0
        for bi in range(start, spe):
            i = bi * batch
            idx = order[i:i + batch]
            if len(idx) < batch:
                idx = np.concatenate([idx, order[:batch - len(idx)]])
            imgs, labels = [], []
            for j in idx:
                path, cls = samples[j]
                img = load_image(path, channels)
                if augment_cfg is not None:
                    from yolo_tpu.data.augment import (
                        distort_hsv, random_augment_classifier)

                    aug_rng = np.random.default_rng(
                        (seed, 3, epoch, int(j)))
                    if augment_cfg.classifier_geometry:
                        if isinstance(net_size, (tuple, list)):
                            if net_size[0] != net_size[1]:
                                raise ValueError(
                                    "classifier geometry augmentation "
                                    "(angle/aspect/min_crop/max_crop) "
                                    "produces square crops — "
                                    "rectangular classifier nets must "
                                    "train without it")
                            geom_size = int(net_size[0])
                        else:
                            geom_size = int(net_size)
                        # darknet load_data_augment order: geometry
                        # crop FIRST, HSV on the net-size crop — also
                        # ~(src/net)² cheaper than distorting the full
                        # source (HSV does not commute with bilinear
                        # resampling, so order is fidelity too)
                        img = random_augment_classifier(
                            img, aug_rng, augment_cfg, geom_size)
                        img = distort_hsv(img, aug_rng, augment_cfg)
                        x = img.astype(np.float32) / 255.0
                    else:
                        # NOTE: HSV on the full-resolution source is
                        # ~(src/net)² more host work than distorting
                        # after the crop, but this path's pixels are
                        # pinned by tests (classifier_preprocess
                        # resizes the FLOAT image; reordering would
                        # change them) — revisit only with a
                        # measured need on a multi-core host
                        img = distort_hsv(img, aug_rng, augment_cfg)
                        x = classifier_preprocess(img, net_size)
                else:
                    x = classifier_preprocess(img, net_size)
                if flip and flips[j]:
                    x = x[:, ::-1]
                imgs.append(x)
                labels.append(cls)
            yield {"images": np.stack(imgs).astype(np.float32),
                   "labels": np.asarray(labels, np.int32)}
