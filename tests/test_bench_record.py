"""Unit tests for the multi-metric perf record tripwire
(benchmarks/record.py — VERDICT r4 next #3). Crafted prior records;
no TPU work."""

import json
import os

import pytest

from benchmarks import record as rec

pytestmark = pytest.mark.quick


def _write(d, n, metrics, backend="tpu"):
    p = os.path.join(d, f"record_r{n:02d}.json")
    with open(p, "w") as f:
        json.dump({"round": n, "backend": backend, "metrics": metrics},
                  f)
    return p


def test_numeric_round_sort(tmp_path):
    d = str(tmp_path)
    for n in (2, 10, 1, 11, 100):
        _write(d, n, {"m": {"value": float(n), "unit": "u"}})
    rounds = [rec.record_round(p) for p in rec.list_records(d)]
    assert rounds == [1, 2, 10, 11, 100]
    assert rec.next_record_path(d).endswith("record_r101.json")


def test_next_record_from_empty(tmp_path):
    assert rec.next_record_path(str(tmp_path)).endswith(
        "record_r01.json")


def test_delta_and_warning(tmp_path):
    d = str(tmp_path)
    _write(d, 1, {"a": {"value": 1000.0, "unit": "img/s"},
                  "b": {"value": 500.0, "unit": "img/s"}})
    cur = {"a": {"value": 850.0, "unit": "img/s"},   # -15% -> warn
           "b": {"value": 510.0, "unit": "img/s"},   # +2%  -> silent
           "c": {"value": 42.0, "unit": "img/s"}}    # new  -> no delta
    warns = rec.compare_metrics(cur, d)
    assert cur["a"]["delta_vs_last"] == pytest.approx(-0.15)
    assert cur["a"]["last_record"] == "record_r01.json"
    assert cur["b"]["delta_vs_last"] == pytest.approx(0.02)
    assert "delta_vs_last" not in cur["c"]
    assert len(warns) == 1 and "[a]" in warns[0] and "15.0%" in warns[0]


def test_cpu_fallback_records_skipped(tmp_path):
    d = str(tmp_path)
    _write(d, 1, {"a": {"value": 1000.0, "unit": "u"}})
    _write(d, 2, {"a": {"value": 3.0, "unit": "u"}},
           backend="cpu_fallback_relay_down")
    cur = {"a": {"value": 990.0, "unit": "u"}}
    warns = rec.compare_metrics(cur, d)
    # compared against r01 (r02 is a CPU outage record), so -1%: silent
    assert cur["a"]["last_record"] == "record_r01.json"
    assert warns == []


def test_before_round_excludes_self(tmp_path):
    """--compare-only re-diffs the newest record against its
    PREDECESSOR, not itself."""
    d = str(tmp_path)
    _write(d, 1, {"a": {"value": 1000.0, "unit": "u"}})
    _write(d, 2, {"a": {"value": 800.0, "unit": "u"}})
    cur = {"a": {"value": 800.0, "unit": "u"}}
    warns = rec.compare_metrics(cur, d, before_round=2)
    assert cur["a"]["last_record"] == "record_r01.json"
    assert len(warns) == 1   # -20% vs r01

    # without the exclusion it would self-compare to r02 (0%)
    cur2 = {"a": {"value": 800.0, "unit": "u"}}
    assert rec.compare_metrics(cur2, d) == []
    assert cur2["a"]["last_record"] == "record_r02.json"


def test_malformed_record_skipped(tmp_path):
    d = str(tmp_path)
    with open(os.path.join(d, "record_r03.json"), "w") as f:
        f.write("{not json")
    _write(d, 2, {"a": {"value": 100.0, "unit": "u"}})
    cur = {"a": {"value": 100.0, "unit": "u"}}
    rec.compare_metrics(cur, d)
    assert cur["a"]["last_record"] == "record_r02.json"


def test_metric_registry_names_stable():
    """The docs/PERF.md 'recorded by' pointers reference these names;
    renames must update both."""
    assert set(rec.METRICS) == {
        "yolov3_fused_b128", "tiny_voc_fused_b128",
        "eval_exact_nms_b32", "tree_map80_eval_b32", "train_step_b128"}


def test_subset_run_does_not_blind_other_metrics(tmp_path):
    """Per-METRIC comparison (code-review r5): a --only subset run
    writes a record missing most metrics; the next full run must still
    compare each metric against the newest record that CARRIES it."""
    d = str(tmp_path)
    _write(d, 5, {"a": {"value": 1000.0, "unit": "u"},
                  "b": {"value": 500.0, "unit": "u"}})
    _write(d, 6, {"a": {"value": 1010.0, "unit": "u"}})  # --only a
    cur = {"a": {"value": 1005.0, "unit": "u"},
           "b": {"value": 250.0, "unit": "u"}}           # b: -50%!
    warns = rec.compare_metrics(cur, d)
    assert cur["a"]["last_record"] == "record_r06.json"
    assert cur["b"]["last_record"] == "record_r05.json"
    assert len(warns) == 1 and "[b]" in warns[0]
