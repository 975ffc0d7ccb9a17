from yolo_tpu.configs.names import COCO_NAMES, VOC_NAMES
from yolo_tpu.configs.specs import (
    Conv,
    LayerSpec,
    MaxPool,
    ModelConfig,
    Reorg,
    Route,
    conv_specs,
    resolve_route,
)
from yolo_tpu.configs.variants import (
    TINY_YOLOV2_VOC,
    VARIANTS,
    YOLOV2_COCO,
    YOLOV2_VOC,
    get_variant,
)

__all__ = [
    "COCO_NAMES", "VOC_NAMES", "Conv", "LayerSpec", "MaxPool", "ModelConfig",
    "Reorg", "Route", "conv_specs", "resolve_route", "TINY_YOLOV2_VOC",
    "VARIANTS", "YOLOV2_COCO", "YOLOV2_VOC", "get_variant",
]
