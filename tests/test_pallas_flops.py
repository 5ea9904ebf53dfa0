"""Analytic Pallas-kernel FLOP accounting (benchmarks.pallas_train_flops +
ops/pallas_attention.{relpos,masked,bias}_flops). XLA's cost analysis counts
tpu_custom_call as ZERO flops, so the bench adds these analytically — the
counts must mirror the layers.py routing gates and scale like the kernels."""

import numpy as np

from streamspeech_tpu import benchmarks as bm
from streamspeech_tpu.models import layers as L
from streamspeech_tpu.ops import pallas_attention as pa
from streamspeech_tpu.train.synthetic import full_config


def test_per_kernel_flops_scaling():
    # forward-only vs train: backward adds work, train strictly larger
    for f in (lambda t: pa.relpos_flops(2, 4, 256, 64, train=t),
              lambda t: pa.masked_flops(2, 4, 1280, 64, train=t),
              lambda t: pa.bias_flops(2, 4, 1280, 128, 64, train=t)):
        fwd, train = f(False), f(True)
        assert 0 < fwd < train
    # linear in batch and heads
    assert pa.masked_flops(4, 4, 1280, 64) == 2 * pa.masked_flops(2, 4, 1280, 64)
    assert pa.bias_flops(2, 8, 1280, 128, 64) == 2 * pa.bias_flops(2, 4, 1280, 128, 64)
    # quadratic-ish in T for self-attention (nq grows with T and each block
    # attends to all T): T -> 2T should be ~4x
    r = pa.masked_flops(2, 4, 2560, 64) / pa.masked_flops(2, 4, 1280, 64)
    assert 3.5 < r < 4.5


def test_pallas_train_flops_mirrors_gates(monkeypatch):
    cfg = full_config()
    # on CPU the gates are all False -> zero
    assert bm.pallas_train_flops(cfg, 8, 1024, 48) == 0.0

    # force every gate on: all three routes counted, train > fwd-only
    monkeypatch.setattr(L, "_pallas_ok", lambda t, d: True)
    monkeypatch.setattr(L, "_masked_pallas_ok", lambda t, d: True)
    monkeypatch.setattr(L, "_bias_pallas_ok", lambda s, d: True)
    full = bm.pallas_train_flops(cfg, 8, 1024, 48)
    fwd = bm.pallas_train_flops(cfg, 8, 1024, 48, train=False)
    assert 0 < fwd < full

    # ablating one gate strictly reduces the count (the ablation rows in
    # scripts/profile_train.py rely on this mirroring)
    monkeypatch.setattr(L, "_masked_pallas_ok", lambda t, d: False)
    assert 0 < bm.pallas_train_flops(cfg, 8, 1024, 48) < full

    # sanity of magnitude: full model at bench shape is O(0.1-1) TFLOP/step
    assert 1e10 < full < 5e12


def test_eff_block_q_divides():
    for t in (128, 256, 1200, 1280, 640):
        bq = pa._eff_block_q(t, 128)
        assert t % bq == 0 and 1 <= bq <= 128
