"""LightweightConv / DynamicConv vs the ACTUAL reference torch modules.

Shared random weights through both frameworks; outputs must agree <=1e-5.
Reference: fairseq/fairseq/modules/lightweight_convolution.py:137 (TBC),
fairseq/fairseq/modules/dynamic_convolution.py:75 (TBC).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_torch import load_reference_modules
from streamspeech_tpu.models.lightconv import DynamicConv, LightweightConv

R = load_reference_modules()
torch.manual_seed(0)

B, T, C, H, K = 2, 13, 8, 4, 5


def _np(x):
    return np.asarray(x, dtype=np.float32)


@pytest.mark.parametrize("weight_softmax", [False, True])
@pytest.mark.parametrize("padding_l", [K - 1, K // 2])
def test_lightweight_conv_parity(weight_softmax, padding_l):
    ref = R.LightweightConv1dTBC(C, kernel_size=K, padding_l=padding_l,
                                 num_heads=H, weight_softmax=weight_softmax,
                                 bias=True)
    ref.eval()
    mod = LightweightConv(input_size=C, kernel_size=K, padding_l=padding_l,
                          num_heads=H, weight_softmax=weight_softmax,
                          use_bias=True)
    params = {"params": {
        "weight": jnp.asarray(_np(ref.weight.detach())),
        "bias": jnp.asarray(_np(ref.bias.detach())),
    }}
    x = np.random.RandomState(1).randn(B, T, C).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x).permute(1, 0, 2).contiguous()).permute(1, 0, 2)
    got = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5,
                               rtol=1e-5)


@pytest.mark.parametrize("weight_softmax,renorm", [(False, False),
                                                   (True, False),
                                                   (True, True)])
@pytest.mark.parametrize("padding_l", [K - 1, K // 2])
def test_dynamic_conv_parity(weight_softmax, renorm, padding_l):
    ref = R.DynamicConv1dTBC(C, kernel_size=K, padding_l=padding_l,
                             num_heads=H, weight_softmax=weight_softmax,
                             renorm_padding=renorm, bias=True, conv_bias=True)
    ref.eval()
    mod = DynamicConv(input_size=C, kernel_size=K, padding_l=padding_l,
                      num_heads=H, weight_softmax=weight_softmax,
                      renorm_padding=renorm, use_bias=True, conv_bias=True)
    params = {"params": {
        "weight_linear": {
            "kernel": jnp.asarray(_np(ref.weight_linear.weight.detach()).T),
            "bias": jnp.asarray(_np(ref.weight_linear.bias.detach())),
        },
        "conv_bias": jnp.asarray(_np(ref.conv_bias.detach())),
    }}
    x = np.random.RandomState(2).randn(B, T, C).astype(np.float32)
    with torch.no_grad():
        # renorm_padding is only implemented in the expanded (band-matrix)
        # path — force it with unfold=False (dynamic_convolution.py:199)
        want = ref(torch.tensor(x).permute(1, 0, 2).contiguous(),
                   unfold=False).permute(1, 0, 2)
    got = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5,
                               rtol=1e-5)


def test_lightweight_step_matches_forward():
    mod = LightweightConv(input_size=C, kernel_size=K, num_heads=H,
                          weight_softmax=True, use_bias=True)
    x = jnp.asarray(np.random.RandomState(3).randn(B, T, C), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    full = mod.apply(params, x)
    cache = jnp.zeros((B, K - 1, C))
    for t in range(T):
        y, cache = mod.apply(params, x[:, t], cache, method=LightweightConv.step)
        np.testing.assert_allclose(np.asarray(y), np.asarray(full[:, t]),
                                   atol=1e-5, rtol=1e-5)


def test_dynamic_step_matches_forward():
    mod = DynamicConv(input_size=C, kernel_size=K, num_heads=H,
                      weight_softmax=True, use_bias=True, conv_bias=True)
    x = jnp.asarray(np.random.RandomState(4).randn(B, T, C), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    full = mod.apply(params, x)
    cache = jnp.zeros((B, K - 1, C))
    for t in range(T):
        y, cache = mod.apply(params, x[:, t], cache, method=DynamicConv.step)
        np.testing.assert_allclose(np.asarray(y), np.asarray(full[:, t]),
                                   atol=1e-5, rtol=1e-5)


def test_dynamic_conv_separate_query():
    mod = DynamicConv(input_size=C, kernel_size=K, num_heads=H,
                      weight_softmax=True, query_size=6)
    x = jnp.asarray(np.random.RandomState(5).randn(B, T, C), jnp.float32)
    q = jnp.asarray(np.random.RandomState(6).randn(B, T, 6), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x, q)
    out = mod.apply(params, x, q)
    assert out.shape == (B, T, C)
    assert bool(jnp.isfinite(out).all())
