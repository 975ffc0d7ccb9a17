"""Golden tests for the Pallas fused conv block (interpret mode on CPU,
SURVEY.md §4.2.1)."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax import lax

from yolo_tpu.ops.pallas.conv_kernel import eligible, fused_conv_bias_act


def _xla_ref(x, w, b, act):
    pad = w.shape[0] // 2
    y = lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1, 1),
        ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32) + b
    if act == "leaky":
        y = jnp.where(y > 0, y, 0.1 * y)
    return y


@pytest.mark.parametrize("ks,act", [(3, "leaky"), (1, "leaky"), (3, "linear")])
def test_matches_xla(ks, act):
    rng = np.random.default_rng(0)
    b, h, w, cin, co = 2, 6, 6, 128, 128
    x = jnp.asarray(rng.normal(0, 1, (b, h, w, cin)).astype(np.float32))
    wgt = jnp.asarray(rng.normal(0, 0.05, (ks, ks, cin, co)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.5, co).astype(np.float32))
    want = np.asarray(_xla_ref(x, wgt, bias, act))
    got = np.asarray(fused_conv_bias_act(x, wgt, bias, act=act,
                                         interpret=True), np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_eligibility():
    w3 = np.zeros((3, 3, 128, 256), np.float32)
    assert eligible(w3, 1)
    assert not eligible(w3, 2)                                # strided
    assert not eligible(np.zeros((3, 3, 3, 128), np.float32), 1)   # cin<128
    assert not eligible(np.zeros((3, 3, 128, 125), np.float32), 1)  # co%128
