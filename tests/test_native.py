"""Native C++ preprocessing vs the cv2 oracle (exact-semantics contract)."""

import numpy as np
import pytest

from yolo_tpu.native import preproc
from yolo_tpu.ops import numpy_ref as npr


@pytest.fixture(scope="module")
def native_ok():
    if not preproc.available():
        pytest.skip("native toolchain unavailable")
    return True


@pytest.mark.parametrize("shape", [(480, 640), (640, 480), (416, 416),
                                   (100, 300), (77, 53)])
def test_matches_cv2_oracle(native_ok, shape):
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (3, *shape, 3), dtype=np.uint8)
    got = preproc.letterbox_batch(imgs, 416)
    for i in range(3):
        want, *_ = npr.letterbox(imgs[i], 416, 416)
        np.testing.assert_allclose(got[i], want, rtol=0, atol=2e-6)


def test_matches_device_letterbox(native_ok):
    import jax.numpy as jnp

    from yolo_tpu.ops.letterbox import letterbox

    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 256, (2, 200, 320, 3), dtype=np.uint8)
    got = preproc.letterbox_batch(imgs, 416)
    want = np.asarray(letterbox(jnp.asarray(imgs), 416))
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-6)


def test_threads_deterministic(native_ok):
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (16, 97, 133, 3), dtype=np.uint8)
    a = preproc.letterbox_batch(imgs, 224, n_threads=1)
    b = preproc.letterbox_batch(imgs, 224, n_threads=8)
    np.testing.assert_array_equal(a, b)


def test_half_even_rounding_matches_python(native_ok):
    # 417x832 at net 416: w*scale = 208.5 — half-to-even must give 208
    # in both the native and Python geometry (review finding)
    import jax.numpy as jnp

    from yolo_tpu.ops.letterbox import letterbox, letterbox_geometry

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (417, 832, 3), dtype=np.uint8)
    scale, rh, rw, px, py = letterbox_geometry(417, 832, 416)
    got = preproc.letterbox_batch(img[None], 416)[0]
    want = np.asarray(letterbox(jnp.asarray(img[None]), 416))[0]
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-6)
