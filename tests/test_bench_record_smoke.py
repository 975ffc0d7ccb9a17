"""Slow CPU smoke for the record metric runners (kept OUT of the
quick-marked tests/test_bench_record.py module: the module-level
quick pytestmark would pull these jit-heavy tests into the
inner-loop tier — code-review r5)."""

import pytest

from benchmarks import record as rec


@pytest.mark.slow
def test_detector_metric_plumbing_cpu():
    """The shared metric runner (cfg -> folded random params ->
    jitted detector -> pipelined throughput with a device->host sync
    fetch) works end-to-end on a micro model — the real-chip capture
    exercises the same plumbing at full size (record_r01.json)."""
    from yolo_tpu.configs.specs import Conv, MaxPool, ModelConfig

    micro = ModelConfig(
        name="record-smoke",
        layers=(Conv(8), MaxPool(2, 2), Conv(8), MaxPool(2, 2),
                Conv(8), MaxPool(2, 2), Conv(8), MaxPool(2, 2),
                Conv(8), MaxPool(2, 2),
                Conv(2 * (5 + 2), size=1, bn=False, act="linear")),
        anchors=((1.0, 1.5), (3.0, 3.0)),
        class_names=("a", "b"), input_size=64)
    m = rec._detector_metric(None, 2, conf=0.2,
                             compute_dtype="float32",
                             head="reference", nms_impl="xla",
                             iters=2, warmup=1, cfg=micro)
    assert m["unit"] == "img/s/chip" and m["value"] > 0
    m2 = rec._detector_metric(None, 2, conf=0.2,
                              compute_dtype="float32",
                              head="reference", nms_impl="xla",
                              iters=2, warmup=1, raw_hw=(96, 128),
                              cfg=micro)
    assert m2["value"] > 0
