"""Interpret-mode parity for the fused not-blank posterior kernel
(ops/pallas_policy.py) against the reference XLA formula — the same
test shape the attention kernels get (tests/test_pallas_attention.py
pattern): exactness, block-boundary carry, blank index variants, odd
(padded) T and V, and bf16 inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamspeech_tpu.ops.pallas_policy import (nb_pallas_ok,
                                                not_blank_probs_pallas)


def reference_not_blank(logits, blank=0):
    """The reference concatenate-out-the-blank-column form
    (`streamspeech_model.py:288-314`), fp32."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    nonblank = jnp.concatenate(
        [probs[:, :, :blank], probs[:, :, blank + 1:]], axis=-1)
    prev = jnp.pad(nonblank[:, :-1], ((0, 0), (1, 0), (0, 0)))
    repeat = jnp.sum(prev * nonblank, axis=-1)
    blank_p = probs[:, :, blank]
    return 1.0 - (repeat + blank_p)


@pytest.mark.parametrize("blank", [0, 3, 11])
def test_interpret_parity(blank):
    rng = np.random.default_rng(blank)
    logits = jnp.asarray(rng.normal(size=(2, 40, 12)).astype(np.float32) * 4)
    ref = reference_not_blank(logits, blank)
    got = not_blank_probs_pallas(logits, blank, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_block_boundary_carry():
    """T spanning multiple time blocks: the carried previous-row scratch must
    make the dot at every block boundary match the contiguous formula (tc is
    min(128, T) so T=300 runs 3 blocks with a padded tail)."""
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(3, 300, 130)).astype(np.float32))
    ref = reference_not_blank(logits, 0)
    got = not_blank_probs_pallas(logits, 0, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_bf16_inputs_close():
    rng = np.random.default_rng(1)
    x32 = rng.normal(size=(2, 64, 200)).astype(np.float32)
    ref = reference_not_blank(jnp.asarray(x32), 0)
    got = not_blank_probs_pallas(jnp.asarray(x32, jnp.bfloat16), 0,
                                 interpret=True)
    # bf16 rounding of the logits themselves dominates the diff
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-2)


def test_no_gradient_flows():
    def f(logits):
        return jnp.sum(not_blank_probs_pallas(logits, 0, interpret=True))

    g = jax.grad(f)(jnp.ones((1, 16, 130), jnp.float32))
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_gate_requires_tpu():
    # on CPU the gate must refuse regardless of shape
    assert not nb_pallas_ok(256, 6000) or jax.default_backend() == "tpu"
