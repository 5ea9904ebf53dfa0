"""Mesh-sharded serving exactness: a BatchedStreamingSession whose stream
batch is sharded over a device mesh (runtime/batched.py _shard_over_mesh) must
reproduce the single-device batched session bit-for-bit — encoder frames, CTC
ids, MT hypotheses, units, durations, and emitted waveforms.

This is the serving analogue of data-parallel training: the tick is
batch-parallel, so XLA partitions every program over the 'data' axis with no
collectives, and per-stream numerics cannot change. The reference has no
multi-device serving at all (one utterance per single-GPU agent process,
`agent/speech_to_speech.streamspeech.agent.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from streamspeech_tpu.agents.streamspeech import StreamSpeechAgentConfig
from streamspeech_tpu.eval.batched_evaluator import BatchedS2STEvaluator
from streamspeech_tpu.models.streamspeech import StreamSpeechModel, init_params
from streamspeech_tpu.models.vocoder import CodeGenerator
from streamspeech_tpu.runtime.batched import BatchedStreamingSession
from streamspeech_tpu.runtime.session import StreamSpeechEngine
from streamspeech_tpu.train.synthetic import tiny_config
from tests.test_batched_eval import doctor_params, make_dicts
from tests.test_vocoder import tiny_cfg as tiny_vocoder_cfg

CHUNK, CONV_CHUNK = 4, 8


@pytest.fixture(scope="module")
def stack():
    cfg = tiny_config()
    model = StreamSpeechModel(cfg)
    variables = doctor_params(init_params(model, jax.random.PRNGKey(0)))
    voc_cfg = tiny_vocoder_cfg()
    voc_cfg["num_embeddings"] = cfg.unit_decoder.vocab_size - 4
    vocoder = CodeGenerator(voc_cfg)
    voc_vars = vocoder.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 4), jnp.int32), max_frames=8)
    engine = StreamSpeechEngine(model, variables, vocoder, voc_vars,
                                max_enc_frames=128, max_mt_tokens=32,
                                mt_buckets=(8, 16, 32),
                                unit_buckets=(16, 32, 64))
    src_dict, unit_dict = make_dicts(cfg.mt_decoder.vocab_size, 19)
    return cfg, engine, src_dict, unit_dict


def data_mesh(n: int) -> Mesh:
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices (conftest forces 8 CPU devices)")
    return Mesh(np.array(devs[:n]), ("data",))


def test_sharded_state_placement(stack):
    _, engine, _, _ = stack
    mesh = data_mesh(4)
    bs = BatchedStreamingSession(engine, 4, mesh=mesh)
    # batch-leading arrays sharded over 'data'; scalar pos replicated
    kv0 = bs.enc_state.kv[0]
    assert len(kv0.k.sharding.device_set) == 4
    assert bs.enc_state.pos.sharding.is_fully_replicated
    assert len(bs.enc_buf.sharding.device_set) == 4
    with pytest.raises(ValueError):
        BatchedStreamingSession(engine, 6, mesh=mesh)  # 6 % 4 != 0


def test_mesh_encode_matches_unsharded(stack):
    _, engine, _, _ = stack
    mesh = data_mesh(4)
    rng = np.random.RandomState(7)
    streams = [rng.randn(n, 80).astype(np.float32)
               for n in (100, 64, 83, 128)]

    plain = BatchedStreamingSession(engine, 4)
    sharded = BatchedStreamingSession(engine, 4, mesh=mesh)
    for bs in (plain, sharded):
        for i, f in enumerate(streams):
            bs.push_features(i, f, finished=True)
        bs.encode_ready_blocks(CHUNK, CONV_CHUNK)

    assert plain.asr_ids == sharded.asr_ids
    assert plain.st_ids == sharded.st_ids
    np.testing.assert_array_equal(plain.enc_len, sharded.enc_len)
    # partitioned compilation may fuse differently -> ~1e-6 float drift;
    # integer outputs (the CTC argmax ids asserted above) stay identical
    np.testing.assert_allclose(np.asarray(sharded.enc_buf),
                               np.asarray(plain.enc_buf),
                               rtol=2e-3, atol=2e-5)


def test_mesh_evaluator_matches_unsharded(stack, tmp_path):
    """Full S2ST corpus eval through the fused batched tick, mesh vs plain:
    identical per-instance delays, durations, and waveforms."""
    _, engine, src_dict, unit_dict = stack
    agent_cfg = StreamSpeechAgentConfig(source_segment_size=320)
    rng = np.random.RandomState(5)
    lengths = [11200, 19200, 8000, 24000]
    sources = [list(rng.uniform(-0.3, 0.3, n)) for n in lengths]
    refs = ["dummy"] * len(sources)

    plain = BatchedS2STEvaluator(engine, agent_cfg, src_dict, src_dict,
                                 unit_dict, batch=4, quality_metrics=[],
                                 output_dir=str(tmp_path / "plain"))
    plain(sources, refs)
    mesh = data_mesh(4)
    shard = BatchedS2STEvaluator(engine, agent_cfg, src_dict, src_dict,
                                 unit_dict, batch=4, mesh=mesh,
                                 quality_metrics=[],
                                 output_dir=str(tmp_path / "mesh"))
    shard(sources, refs)

    assert any(len(ins.delays) > 0 for ins in plain.instances.values()), \
        "no instance ever wrote — exactness comparison is vacuous"
    for i in plain.instances:
        a = plain.instances[i].summarize()
        b = shard.instances[i].summarize()
        assert a["delays"] == b["delays"], f"instance {i} delays differ"
        np.testing.assert_allclose(a["durations"], b["durations"], atol=1e-6)
        assert plain.instances[i].final_units == shard.instances[i].final_units
        for wa, wb in zip(plain.instances[i].prediction_list,
                          shard.instances[i].prediction_list):
            np.testing.assert_allclose(np.asarray(wa), np.asarray(wb),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"instance {i} wav differs")
