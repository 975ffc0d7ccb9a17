"""Model variants. Topologies and anchors are pinned by the darknet cfg
files the reference's weights come from (SURVEY.md §2.1 [PAPER]):
yolov2-tiny-voc.cfg, yolov2-voc.cfg, yolov2.cfg (COCO), and
yolov2-tiny.cfg (COCO — same tiny topology, COCO anchors/classes)."""

from __future__ import annotations

from yolo_tpu.configs.names import COCO_NAMES, VOC_NAMES
from yolo_tpu.configs.specs import Conv, MaxPool, ModelConfig, Reorg, Route

# Anchors in 13x13-cell units [SURVEY.md §5.6, cfg-pinned].
TINY_VOC_ANCHORS = (
    (1.08, 1.19), (3.42, 4.41), (6.63, 11.38), (9.42, 5.11), (16.62, 10.52),
)
VOC_ANCHORS = (
    (1.3221, 1.73145), (3.19275, 4.00944), (5.05587, 8.09892),
    (9.47112, 4.84053), (11.2364, 10.0071),
)
COCO_ANCHORS = (
    (0.57273, 0.677385), (1.87446, 2.06253), (3.33843, 5.47434),
    (7.88282, 3.52778), (9.77052, 9.16828),
)


def _tiny_yolov2_layers(num_out: int):
    """yolov2-tiny-voc.cfg: 6x (conv3x3 + maxpool), pool #6 stride 1,
    then 3x3 conv 1024 x2, final 1x1 linear conv [SURVEY.md §2.1]."""
    return (
        Conv(16), MaxPool(2, 2),
        Conv(32), MaxPool(2, 2),
        Conv(64), MaxPool(2, 2),
        Conv(128), MaxPool(2, 2),
        Conv(256), MaxPool(2, 2),
        Conv(512), MaxPool(2, 1),   # stride-1 SAME pool — parity trap §7.2
        Conv(1024),
        Conv(1024),
        Conv(num_out, size=1, bn=False, act="linear"),
    )


def _yolov2_layers(num_out: int):
    """yolov2.cfg: Darknet-19 backbone (18 convs w/o the 1000-class head)
    + passthrough detection head [SURVEY.md §2.1, YOLO9000 Table 6].

    Layer indices match darknet's (each entry is one darknet layer), so the
    Route offsets are copied verbatim from the cfg: route -9 -> the
    26x26x512 conv output; route (-1, -4) -> concat(reorg, conv1024) in
    listed order (channel order matters for pretrained weights).
    """
    return (
        Conv(32), MaxPool(),                                   # 0-1
        Conv(64), MaxPool(),                                   # 2-3
        Conv(128), Conv(64, 1), Conv(128), MaxPool(),          # 4-7
        Conv(256), Conv(128, 1), Conv(256), MaxPool(),         # 8-11
        Conv(512), Conv(256, 1), Conv(512), Conv(256, 1),      # 12-15
        Conv(512),                                             # 16 (26x26x512)
        MaxPool(),                                             # 17
        Conv(1024), Conv(512, 1), Conv(1024), Conv(512, 1),    # 18-21
        Conv(1024),                                            # 22
        Conv(1024), Conv(1024),                                # 23-24 head
        Route((-9,)),                                          # 25 -> 16
        Conv(64, 1),                                           # 26
        Reorg(2),                                              # 27
        Route((-1, -4)),                                       # 28 -> (27, 24)
        Conv(1024),                                            # 29
        Conv(num_out, size=1, bn=False, act="linear"),         # 30
    )


TINY_YOLOV2_VOC = ModelConfig(
    name="tiny-yolov2-voc",
    layers=_tiny_yolov2_layers(5 * (5 + 20)),
    anchors=TINY_VOC_ANCHORS,
    class_names=VOC_NAMES,
    input_size=416,
)

YOLOV2_VOC = ModelConfig(
    name="yolov2-voc",
    layers=_yolov2_layers(5 * (5 + 20)),
    anchors=VOC_ANCHORS,
    class_names=VOC_NAMES,
    input_size=416,
)

YOLOV2_COCO = ModelConfig(
    name="yolov2-coco",
    layers=_yolov2_layers(5 * (5 + 80)),
    anchors=COCO_ANCHORS,
    class_names=COCO_NAMES,
    input_size=416,
)

def _tiny_yolov2_coco_layers(num_out: int):
    """yolov2-tiny.cfg (COCO): same conv/pool trunk as tiny-voc but the
    head is conv1024 -> conv512 -> 1x1 (NOT tiny-voc's 1024 -> 1024).
    Pinned by the official yolov2-tiny.weights byte count:
    44,948,600 = 20-byte header + 4 x 11,237,145 params, which only the
    512-filter topology produces."""
    return (
        Conv(16), MaxPool(2, 2),
        Conv(32), MaxPool(2, 2),
        Conv(64), MaxPool(2, 2),
        Conv(128), MaxPool(2, 2),
        Conv(256), MaxPool(2, 2),
        Conv(512), MaxPool(2, 1),
        Conv(1024),
        Conv(512),
        Conv(num_out, size=1, bn=False, act="linear"),
    )


TINY_YOLOV2_COCO = ModelConfig(
    name="tiny-yolov2-coco",
    layers=_tiny_yolov2_coco_layers(5 * (5 + 80)),
    anchors=COCO_ANCHORS,  # yolov2-tiny.cfg reuses the yolov2.cfg anchors
    class_names=COCO_NAMES,
    input_size=416,
)

VARIANTS = {
    "tiny-voc": TINY_YOLOV2_VOC,
    "voc": YOLOV2_VOC,
    "coco": YOLOV2_COCO,
    "tiny-coco": TINY_YOLOV2_COCO,
}


def get_variant(name: str, input_size: int | None = None) -> ModelConfig:
    cfg = VARIANTS[name]
    if input_size is not None:
        cfg = cfg.with_input_size(input_size)
    return cfg
