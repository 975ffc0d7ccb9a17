"""yolo_tpu — a TPU-native JAX/XLA/Pallas re-implementation of the
wns349/tensorflow-yolo capability surface (YOLOv2 family detection).

Design notes
------------
The reference (see SURVEY.md; source tree unavailable — capability surface
pinned by BASELINE.json and the darknet ``.cfg``/``.weights`` formats it
consumes) is a single-process TF-1.x YOLOv2 app: darknet weights in, boxes
out, plus fine-tuning with the YOLO multi-part loss.

This package is a ground-up TPU-first redesign, not a port:

* Models are *data*: a darknet-equivalent layer IR (``configs.specs``)
  interpreted by one functional executor (``models.graph``) — traced once
  under ``jax.jit``, NHWC, static shapes, MXU-friendly convs.
* Decode + class-wise NMS run **on device** with fixed shapes (no host
  round-trip), unlike the reference's host-side numpy postprocess.
* Parallelism is explicit ``jax.sharding`` over a device mesh
  (``parallel.sharding``): batch-sharded inference, DP training with
  gradient ``psum`` over ICI.
* Hot blocks have Pallas kernels (``ops.pallas``) with stock-XLA fallbacks.
* Host-side preprocessing has a native C++ fast path (``native/``).
"""

__version__ = "0.1.0"


def load(*args, **kw):
    """See yolo_tpu.api.load — weights file -> callable detector."""
    from yolo_tpu.api import load as _load

    return _load(*args, **kw)


def load_classifier(*args, **kw):
    """See yolo_tpu.api.load_classifier — classifier weights ->
    callable top-k model."""
    from yolo_tpu.api import load_classifier as _load

    return _load(*args, **kw)
