"""GPipe pipeline parallelism (`parallel/pipeline.py`) — forward and grads
must match the sequential layer stack exactly (GPipe is synchronous)."""

import jax
import jax.numpy as jnp
import numpy as np

from streamspeech_tpu.parallel.pipeline import (
    make_pipe_mesh,
    pipeline_apply,
    stack_stage_params,
)


def _stage_fn(params, x):
    # simple transformer-ish block: linear + gelu + linear, residual
    h = jax.nn.gelu(x @ params["w1"] + params["b1"])
    return x + h @ params["w2"]


def _make_params(rng, d, hidden, n_stages):
    out = []
    for i in range(n_stages):
        k1, k2, rng = jax.random.split(rng, 3)
        out.append({
            "w1": jax.random.normal(k1, (d, hidden)) * 0.1,
            "b1": jnp.zeros((hidden,)),
            "w2": jax.random.normal(k2, (hidden, d)) * 0.1,
        })
    return out


def _sequential(per_stage, x_flat):
    for p in per_stage:
        x_flat = _stage_fn(p, x_flat)
    return x_flat


def test_pipeline_matches_sequential():
    n_stages, n_micro, mb, d = 4, 6, 2, 16
    mesh = make_pipe_mesh(n_stages, jax.devices()[:n_stages])
    per_stage = _make_params(jax.random.PRNGKey(0), d, 32, n_stages)
    stacked = stack_stage_params(per_stage)
    x = jax.random.normal(jax.random.PRNGKey(1), (n_micro, mb, d))

    out = pipeline_apply(_stage_fn, stacked, x, mesh)
    ref = _sequential(per_stage, x.reshape(n_micro * mb, d)) \
        .reshape(n_micro, mb, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_grads_match_sequential():
    n_stages, n_micro, mb, d = 4, 4, 2, 8
    mesh = make_pipe_mesh(n_stages, jax.devices()[:n_stages])
    per_stage = _make_params(jax.random.PRNGKey(2), d, 16, n_stages)
    stacked = stack_stage_params(per_stage)
    x = jax.random.normal(jax.random.PRNGKey(3), (n_micro, mb, d))
    tgt = jax.random.normal(jax.random.PRNGKey(4), (n_micro, mb, d))

    def loss_pipe(sp):
        y = pipeline_apply(_stage_fn, sp, x, mesh)
        return jnp.mean((y - tgt) ** 2)

    def loss_seq(per):
        y = _sequential(per, x.reshape(-1, d)).reshape(x.shape)
        return jnp.mean((y - tgt) ** 2)

    g_pipe = jax.grad(loss_pipe)(stacked)
    g_seq = stack_stage_params(
        list(jax.grad(loss_seq)(per_stage)))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4),
        g_pipe, g_seq)


def test_pipeline_jits_under_jit():
    n_stages, n_micro, mb, d = 2, 3, 2, 8
    mesh = make_pipe_mesh(n_stages, jax.devices()[:n_stages])
    per_stage = _make_params(jax.random.PRNGKey(5), d, 16, n_stages)
    stacked = stack_stage_params(per_stage)
    x = jax.random.normal(jax.random.PRNGKey(6), (n_micro, mb, d))
    f = jax.jit(lambda sp, xx: pipeline_apply(_stage_fn, sp, xx, mesh))
    out = jax.block_until_ready(f(stacked, x))
    ref = _sequential(per_stage, x.reshape(-1, d)).reshape(x.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# real-model staging: the actual ChunkConformerEncoder (BatchNorm running
# stats, rel-pos attention, depthwise chunk conv) through the GPipe schedule
# ---------------------------------------------------------------------------

def _small_encoder(layers=4):
    from streamspeech_tpu.config import EncoderConfig
    from streamspeech_tpu.models.conformer import ChunkConformerEncoder

    cfg = EncoderConfig(embed_dim=16, ffn_embed_dim=32, layers=layers,
                        attention_heads=2, depthwise_conv_kernel_size=7,
                        conv_channels=32, dropout=0.0)
    enc = ChunkConformerEncoder(cfg)
    b, frames = 4, 32
    src = jnp.asarray(np.random.RandomState(0).randn(b, frames, 80),
                      jnp.float32)
    lens = jnp.array([32, 32, 24, 16], jnp.int32)
    variables = enc.init({"params": jax.random.PRNGKey(0)}, src, lens,
                         chunk_size=2, conv_chunk_size=2,
                         use_running_stats=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    return enc, variables, src, lens


def test_conformer_pipeline_matches_sequential():
    """Forward of the staged 4L conformer == the sequential encoder (eval
    mode; ragged lengths ride the pipeline as per-microbatch extras)."""
    from streamspeech_tpu.parallel.pipeline import (
        conformer_pipeline_forward,
        make_pipe_mesh,
    )

    enc, variables, src, lens = _small_encoder(layers=4)
    mesh = make_pipe_mesh(2, jax.devices()[:2])
    ref, ref_lens = enc.apply(variables, src, lens, chunk_size=2,
                              conv_chunk_size=2)
    out, out_lens = jax.jit(
        lambda v, s, l: conformer_pipeline_forward(
            enc, v, s, l, mesh, n_micro=2, chunk_size=2, conv_chunk_size=2)
    )(variables, src, lens)
    np.testing.assert_array_equal(np.asarray(out_lens), np.asarray(ref_lens))
    # compare valid rows only (padded rows may see mask-dependent garbage)
    ref_np, out_np = np.asarray(ref), np.asarray(out)
    for i, n in enumerate(np.asarray(ref_lens)):
        np.testing.assert_allclose(out_np[i, :n], ref_np[i, :n],
                                   atol=2e-5, rtol=2e-5)


def test_conformer_pipeline_grads_match_sequential():
    """Grads through the staged conformer w.r.t. the LAYER params == the
    sequential encoder's grads (GPipe synchronous semantics on the real
    model: BatchNorm eval stats, rel-pos tables, chunk conv and all)."""
    from streamspeech_tpu.parallel.pipeline import (
        conformer_pipeline_forward,
        conformer_stage_params,
        make_pipe_mesh,
    )

    enc, variables, src, lens = _small_encoder(layers=4)
    mesh = make_pipe_mesh(4, jax.devices()[:4])

    def loss_pipe(v):
        y, _ = conformer_pipeline_forward(enc, v, src, lens, mesh, n_micro=2,
                                          chunk_size=2, conv_chunk_size=2)
        return jnp.mean(y ** 2)

    def loss_seq(v):
        y, _ = enc.apply(v, src, lens, chunk_size=2, conv_chunk_size=2)
        return jnp.mean(y ** 2)

    g_pipe = jax.grad(loss_pipe)(variables)["params"]
    g_seq = jax.grad(loss_seq)(variables)["params"]
    for k in g_seq:
        if not k.startswith("layers_"):
            continue
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-5, rtol=3e-4),
            g_pipe[k], g_seq[k])
