"""CLI entry points (SURVEY.md §1 L7, §2.1 'CLI entry'): the reference's
train / predict / test mode surface, plus batched detection, VOC mAP
evaluation, darknet export and the benchmark.

  python -m yolo_tpu.cli predict --model tiny-voc --weights v.weights --image dog.jpg
  python -m yolo_tpu.cli detect  --model coco --weights y.weights --images dir/ --batch 32
  python -m yolo_tpu.cli train   --model voc --voc-root VOC2007 --weights init.weights
  python -m yolo_tpu.cli eval    --model voc --voc-root VOC2007 --split test --weights x
  python -m yolo_tpu.cli export  --model voc --checkpoint ck/ --output out.weights
  python -m yolo_tpu.cli bench
"""

from yolo_tpu.cli._main import main  # noqa: E402  (the public entry)
# compatibility re-exports: the pre-split cli.py exposed these at
# module level and tests/library users import them from yolo_tpu.cli
from yolo_tpu.cli._common import (_compute_dtype, _dataset_samples,  # noqa: F401,E402
                                  _get_cfg, _load_params,
                                  _maybe_quantize, _quantize_classifier,
                                  _require_detection, _resolve_weights,
                                  _tree_kw)
from yolo_tpu.cli.detect_cmds import (cmd_classify, cmd_detect,  # noqa: F401,E402
                                      cmd_predict)
from yolo_tpu.cli.eval_cmd import cmd_eval  # noqa: F401,E402
from yolo_tpu.cli.tools_cmds import (cmd_anchors, cmd_bench,  # noqa: F401,E402
                                     cmd_doctor, cmd_export,
                                     cmd_partial, cmd_serve, cmd_zoo)
from yolo_tpu.cli.train_cmd import cmd_train  # noqa: F401,E402
from yolo_tpu.cli.train_helpers import (_batch_accum_from,  # noqa: F401,E402
                                        _lr_schedule_from,
                                        _optimizer_from,
                                        _restore_adapt_ema,
                                        _train_classifier)

