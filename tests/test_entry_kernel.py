"""Fused entry-layer kernel tests (ops/pallas/entry_kernel.py) —
interpret mode on CPU; the TPU timing study is in docs/PERF.md."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from yolo_tpu.ops.pallas import entry_kernel as ek  # noqa: E402


def _reference_nhcw(x, w, b):
    """fp32 conv(3x3 SAME) + bias + leaky + maxpool(2,2) -> NHCW."""
    y = lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + b
    y = jnp.where(y > 0, y, 0.1 * y)
    p = lax.reduce_window(y, -jnp.inf, lax.max,
                          (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return jnp.transpose(p, (0, 1, 3, 2))


class TestBuildPlanes:
    def test_plane_indexing(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
        planes = np.asarray(ek.build_planes(jnp.asarray(x)))
        assert planes.shape == (1, 6, 10, 6)
        xpad = np.pad(x, ((0, 0), (1, 1), (1, 2), (0, 0)))
        for p in range(2):
            for c in range(3):
                for r in range(10):
                    for q in range(6):
                        u = 2 * q + p
                        want = xpad[0, r, u, c] if u < xpad.shape[2] else 0.0
                        assert planes[0, p * 3 + c, r, q] == want, (p, c, r, q)


class TestWStack:
    def test_phase_layout(self):
        rng = np.random.default_rng(1)
        w = rng.standard_normal((3, 3, 3, 32)).astype(np.float32)
        ws = np.asarray(ek.build_wstack(jnp.asarray(w)))
        assert ws.shape == (128, 48)
        for di in range(2):
            for dj in range(2):
                phi = di * 2 + dj
                for dy in range(4):
                    for dx in range(4):
                        yy, xx = dy - di, dx - dj
                        for c in range(3):
                            got = ws[phi * 32:(phi + 1) * 32,
                                     (dy * 4 + dx) * 3 + c]
                            if 0 <= yy < 3 and 0 <= xx < 3:
                                np.testing.assert_array_equal(
                                    got, w[yy, xx, c, :])
                            else:
                                assert (got == 0).all()


class TestFusedEntry:
    @pytest.mark.parametrize("hw", [(16, 16), (32, 48)])
    def test_matches_xla_reference(self, hw):
        rng = np.random.default_rng(2)
        h, w_ = hw
        x = jnp.asarray(rng.standard_normal((2, h, w_, 3)), jnp.float32)
        wgt = jnp.asarray(rng.standard_normal((3, 3, 3, 32)) * 0.2,
                          jnp.float32)
        b = jnp.asarray(rng.standard_normal(32) * 0.1, jnp.float32)
        got = np.asarray(ek.fused_entry(x, wgt, b, out_dtype=jnp.float32,
                                        interpret=True))
        want = np.asarray(_reference_nhcw(x, wgt, b))
        assert got.shape == want.shape == (2, h // 2, 32, w_ // 2)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_eligibility(self):
        from yolo_tpu.configs import get_variant

        assert ek.eligible(get_variant("tiny-voc").layers)
        assert ek.eligible(get_variant("coco").layers)
        assert not ek.eligible(get_variant("coco").layers[1:])
        # a DILATED first conv must stay on the XLA path: the kernel
        # computes an undilated 3x3 (code-review finding — a dilated
        # entry would silently return wrong boxes under entry='fused')
        import dataclasses

        layers = get_variant("tiny-voc").layers
        dilated = (dataclasses.replace(layers[0], dilation=2),
                   ) + layers[1:]
        assert not ek.eligible(dilated)


class TestLetterboxPlanes:
    @pytest.mark.parametrize("shape", [(60, 80), (80, 60), (64, 64)])
    def test_exactly_matches_letterbox_then_planes(self, shape):
        from yolo_tpu.ops.letterbox import letterbox

        rng = np.random.default_rng(4)
        h, w = shape
        x = jnp.asarray(rng.integers(0, 256, (2, h, w, 3), dtype=np.uint8))
        want = np.asarray(ek.build_planes(letterbox(x, 64, jnp.float32)))
        got = np.asarray(ek.letterbox_planes(x, 64,
                                             interp_dtype=jnp.float32))
        # same math; contraction order differs between the einsum
        # shapes, so allow fp32 noise (bit-exact on TPU at 416)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_detect_raw_fused_entry_equivalence():
    """detect_raw(entry='fused') == entry='xla' (interpret mode, fp32
    planes + fp32 compute; the TPU bf16 run measured box/score-identical
    — docs/PERF.md)."""
    from yolo_tpu.configs import get_variant
    from yolo_tpu.io import darknet_weights as dw
    from yolo_tpu.models import graph
    from yolo_tpu.models.predict import detect_raw

    import dataclasses

    cfg = dataclasses.replace(get_variant("tiny-voc"), input_size=96,
                              conf_threshold=0.1)
    rng = np.random.default_rng(0)
    params = graph.params_to_jax(graph.fold_params(
        cfg.layers, dw.random_params(cfg.layers, rng), cfg.bn_eps))
    imgs = jnp.asarray(rng.integers(0, 256, (2, 80, 100, 3),
                                    dtype=np.uint8))
    ox = detect_raw(cfg, params, imgs, compute_dtype=jnp.float32,
                    entry="xla", head="reference", nms_impl="xla")
    of = detect_raw(cfg, params, imgs, compute_dtype=jnp.float32,
                    entry="fused", head="reference", nms_impl="xla")
    np.testing.assert_array_equal(np.asarray(ox["valid"]),
                                  np.asarray(of["valid"]))
    v = np.asarray(ox["valid"])
    np.testing.assert_allclose(np.asarray(ox["boxes"])[v],
                               np.asarray(of["boxes"])[v],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ox["scores"])[v],
                               np.asarray(of["scores"])[v],
                               rtol=1e-4, atol=1e-5)
