"""Training reproducibility: same seeds => bitwise-identical trajectory.

Parity with fairseq's `tests/test_reproducibility.py` (SURVEY §4), which
trains twice from a checkpoint and asserts matching loss curves. Here the
whole step is a pure function of (state, batch, rng), so the guarantee is
stronger: exact float equality, including through dropout/SpecAugment RNG.
"""

import functools

import jax
import numpy as np

from streamspeech_tpu.parallel.mesh import make_mesh
from streamspeech_tpu.train.synthetic import synthetic_batch
from streamspeech_tpu.train.trainer import create_sharded_state

from tests.test_train_step import build


@functools.lru_cache(maxsize=1)
def _stack():
    # one build (and one train-step compile) shared by every run
    return build()


def _run(seed_offset: int, steps: int = 4):
    cfg, model, variables, tx, step = _stack()
    # the train step donates its state buffers — give every run fresh copies
    variables = jax.tree.map(lambda x: x.copy(), variables)
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    state = create_sharded_state(variables, tx, mesh)
    batch = synthetic_batch(cfg, batch=4)
    losses = []
    for i in range(steps):
        state, metrics = step(state, batch,
                              jax.random.PRNGKey(seed_offset + i),
                              chunk_size=4, conv_chunk_size=8)
        losses.append(float(metrics["loss_mean"]))
    leaf = np.asarray(jax.tree.leaves(state.params)[0])
    return losses, leaf


def test_same_seed_bitwise_identical():
    l1, p1 = _run(0)
    l2, p2 = _run(0)
    assert l1 == l2, (l1, l2)
    np.testing.assert_array_equal(p1, p2)


def test_different_seed_diverges():
    l1, _ = _run(0)
    l3, _ = _run(1000)
    # dropout/SpecAugment RNG differs -> different (but finite) losses
    assert np.isfinite(l1).all() and np.isfinite(l3).all()
    assert l1 != l3
