"""Anchor k-means tests (YOLO9000 dimension clusters, data/anchors.py)."""

import json

import numpy as np
import pytest

from yolo_tpu.data.anchors import _iou_wh, collect_wh, kmeans_anchors

pytestmark = pytest.mark.quick  # fast inner-loop tier (CLAUDE.md)


class TestIoUWH:
    def test_identical_is_one(self):
        wh = np.array([[0.2, 0.4]])
        np.testing.assert_allclose(_iou_wh(wh, wh), [[1.0]])

    def test_known_value(self):
        # (2x2) vs (4x4) at origin: inter 4, union 16 -> 0.25
        iou = _iou_wh(np.array([[2.0, 2.0]]), np.array([[4.0, 4.0]]))
        np.testing.assert_allclose(iou, [[0.25]])


class TestKMeans:
    def test_recovers_planted_clusters(self):
        rng = np.random.default_rng(0)
        truth = np.array([[0.1, 0.1], [0.3, 0.6], [0.8, 0.4]])
        wh = np.concatenate([
            t * rng.uniform(0.95, 1.05, (200, 2)) for t in truth])
        res = kmeans_anchors(wh, 3, units_wh=13, seed=1)
        got = np.sort(res["anchors"] / 13, axis=0)
        np.testing.assert_allclose(got, np.sort(truth, axis=0), atol=0.03)
        assert res["avg_iou"] > 0.9

    def test_sorted_by_area_and_grid_units(self):
        rng = np.random.default_rng(2)
        res = kmeans_anchors(rng.uniform(0.05, 0.9, (100, 2)), 5, units_wh=19)
        a = res["anchors"]
        areas = a[:, 0] * a[:, 1]
        assert (np.diff(areas) >= 0).all()
        assert a.max() <= 19.0 + 1e-6  # grid units, normalized input

    def test_more_clusters_higher_iou(self):
        rng = np.random.default_rng(3)
        wh = rng.uniform(0.05, 0.9, (300, 2))
        iou2 = kmeans_anchors(wh, 2, seed=0)["avg_iou"]
        iou9 = kmeans_anchors(wh, 9, seed=0)["avg_iou"]
        assert iou9 > iou2

    def test_too_few_boxes_raises(self):
        import pytest

        with pytest.raises(ValueError, match="at least"):
            kmeans_anchors(np.array([[0.1, 0.1]]), 5)

    def test_degenerate_boxes_dropped(self):
        wh = np.array([[0.0, 0.5], [0.2, 0.2], [0.3, 0.3], [0.4, 0.1]])
        res = kmeans_anchors(wh, 3)
        assert res["anchors"].shape == (3, 2)


def test_collect_wh_mixed_sources(tmp_path):
    """collect_wh handles VOC XML paths and pre-parsed (COCO) dicts."""
    xml = tmp_path / "a.xml"
    xml.write_text(
        "<annotation><size><width>100</width><height>100</height></size>"
        "<object><name>cat</name><difficult>0</difficult>"
        "<bndbox><xmin>1</xmin><ymin>1</ymin><xmax>51</xmax>"
        "<ymax>26</ymax></bndbox></object></annotation>")
    coco_ann = {"boxes": np.array([[0.5, 0.5, 0.2, 0.4]], np.float32),
                "classes": np.array([0]), "difficult": np.array([0]),
                "width": 10, "height": 10, "filename": "b.jpg"}
    wh = collect_wh([("a.jpg", str(xml)), ("b.jpg", coco_ann)], ("cat",))
    assert wh.shape == (2, 2)
    np.testing.assert_allclose(wh[0], [0.5, 0.25])
    np.testing.assert_allclose(wh[1], [0.2, 0.4])


def test_cli_anchors(tmp_path):
    import contextlib
    import io as _io

    from yolo_tpu import cli
    from yolo_tpu.configs import get_variant

    cfg = get_variant("tiny-voc")
    rng = np.random.default_rng(0)
    images, anns = [], []
    for i in range(4):
        images.append({"id": i, "file_name": f"x{i}.jpg",
                       "width": 100, "height": 100})
        for _ in range(5):
            w, h = rng.uniform(10, 80, 2)
            anns.append({"image_id": i, "category_id": 1,
                         "bbox": [5, 5, float(w), float(h)], "iscrowd": 0})
    (tmp_path / "inst.json").write_text(json.dumps(
        {"images": images, "annotations": anns,
         "categories": [{"id": 1, "name": cfg.class_names[0]}]}))

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli.main(["anchors", "--model", "tiny-voc",
                  "--coco-json", str(tmp_path / "inst.json"),
                  "--num-anchors", "3"])
    res = json.loads(buf.getvalue().strip())
    assert len(res["anchors"]) == 3
    assert res["num_boxes"] == 20
    assert 0.0 < res["avg_iou"] <= 1.0
    assert len(res["darknet_line"].split(",")) == 6


def test_collect_wh_drops_crowd():
    coco_ann = {"boxes": np.array([[0.5, 0.5, 0.2, 0.4],
                                   [0.5, 0.5, 1.0, 1.0]], np.float32),
                "classes": np.array([0, 0]),
                "difficult": np.array([0, 1]),  # second is iscrowd
                "width": 10, "height": 10, "filename": "b.jpg"}
    wh = collect_wh([("b.jpg", coco_ann)], ("cat",))
    assert wh.shape == (1, 2)
    np.testing.assert_allclose(wh[0], [0.2, 0.4])
