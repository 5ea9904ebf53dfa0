"""Sharding-rule unit tests: TP column/row splits and FSDP coverage."""

import jax
import numpy as np

from streamspeech_tpu.models.streamspeech import StreamSpeechModel, init_params
from streamspeech_tpu.parallel.mesh import make_mesh
from streamspeech_tpu.parallel.sharding import param_shardings
from streamspeech_tpu.train.synthetic import tiny_config


def spec_of(shardings, *path):
    node = shardings
    for p in path:
        node = node[p]
    return tuple(node.spec)


def test_tp_column_row_pairing():
    mesh = make_mesh(data=4, model=2)
    model = StreamSpeechModel(tiny_config())
    variables = init_params(model, jax.random.PRNGKey(0))
    sh = param_shardings(variables["params"], mesh, fsdp=False, tp=True)

    enc_attn = lambda *p: spec_of(sh, "encoder", "layers_0", "self_attn", *p)
    # column-parallel: output dim split
    assert enc_attn("q_proj", "kernel") == (None, "model")
    assert enc_attn("k_proj", "kernel") == (None, "model")
    # row-parallel: input dim split (out_proj pairs with q/k/v)
    assert enc_attn("out_proj", "kernel") == ("model", None)
    # conformer FFN w_1 (column) / w_2 (row)
    assert spec_of(sh, "encoder", "layers_0", "ffn1", "w_1", "kernel") == \
        (None, "model")
    assert spec_of(sh, "encoder", "layers_0", "ffn1", "w_2", "kernel") == \
        ("model", None)
    # decoder fc1/fc2 pairing
    assert spec_of(sh, "mt_decoder", "layers_0", "ffn", "fc1", "kernel") == \
        (None, "model")
    assert spec_of(sh, "mt_decoder", "layers_0", "ffn", "fc2", "kernel") == \
        ("model", None)
    # layer norms replicated
    assert spec_of(sh, "encoder", "layers_0", "final_layer_norm", "scale") == (None,)


def test_fsdp_shards_most_parameters():
    mesh = make_mesh(data=8, model=1)
    model = StreamSpeechModel(tiny_config())
    variables = init_params(model, jax.random.PRNGKey(0))
    sh = param_shardings(variables["params"], mesh, fsdp=True, tp=False)
    leaves = jax.tree.leaves(sh)
    params = jax.tree.leaves(variables["params"])
    sharded_elems = sum(
        int(np.prod(p.shape)) for p, s in zip(params, leaves)
        if any(ax == "data" for ax in s.spec))
    total = sum(int(np.prod(p.shape)) for p in params)
    # the bulk of parameter memory must actually be sharded
    assert sharded_elems / total > 0.8, sharded_elems / total
