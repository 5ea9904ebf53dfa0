"""Checkpointing: native orbax save/load with rotation + fairseq/HiFi-GAN import.

Native path replaces the reference's torch_persistent_save single-file .pt
(`fairseq/fairseq/checkpoint_utils.py:35,288,354`): an orbax PyTree checkpoint per
step with `--keep-last` rotation, storing {params, batch_stats, opt_state, step}
and a JSON sidecar of the resolved config (the reference embeds the full cfg in
the .pt so inference can rebuild the task; we do the same with config.json).

Import path parses the reference's released checkpoints:
- fairseq model .pt: state_dict name mapping (torch [out,in] linear → flax
  [in,out] kernel; conv [out,in,k] → [k,in,out]; BatchNorm running stats →
  batch_stats collection). Layout documented per tower below.
- CodeHiFiGAN vocoder .pt: {"generator": state_dict} with weight-norm params
  (weight_g/weight_v) folded into plain weights, matching the reference's
  remove_weight_norm-after-load (`agent/tts/vocoder.py:38-46`).
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# native orbax checkpoints
# ---------------------------------------------------------------------------


def save_checkpoint(save_dir: str, step: int, state, config: Optional[dict] = None,
                    keep_last: int = 10, keep_best: int = 0,
                    val_metric: Optional[float] = None,
                    maximize: bool = False) -> str:
    import orbax.checkpoint as ocp
    import jax

    d = Path(save_dir).absolute()
    d.mkdir(parents=True, exist_ok=True)
    path = d / f"checkpoint_{step}"
    ckptr = ocp.PyTreeCheckpointer()
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    ckptr.save(path, payload, force=True)
    if config is not None:
        (d / "config.json").write_text(json.dumps(config, indent=2))
    if keep_best > 0 and val_metric is not None:
        _rotate_best(d, path, step, float(val_metric), keep_best, maximize)
    # rotation: keep the newest `keep_last` checkpoints
    ckpts = sorted(d.glob("checkpoint_*"),
                   key=lambda p: int(p.name.split("_")[-1]))
    for old in ckpts[:-keep_last]:
        import shutil
        shutil.rmtree(old, ignore_errors=True)
    return str(path)


_BEST_RE = re.compile(r"checkpoint\.best_(-?[0-9.]+(?:e[+-]?\d+)?)_(\d+)$")


def _scan_best(d: Path):
    """[(metric, step, path)] of the kept best checkpoints in `d`."""
    best = []
    for p in d.glob("checkpoint.best_*"):
        m = _BEST_RE.match(p.name)
        if m:
            best.append((float(m.group(1)), int(m.group(2)), p))
    return best


def would_enter_best(save_dir: str, val: Optional[float], keep_best: int,
                     maximize: bool = False) -> bool:
    """True iff a checkpoint with validation metric `val` would be admitted
    to the --keep-best-checkpoints rotation right now. The train loop asks
    this BEFORE serializing: at a validation point that is not also a save
    interval, a metric that cannot enter the best set would otherwise pay a
    full state write (params+opt_state through the ~47 MB/s tunnel) for a
    checkpoint that is immediately prunable."""
    import math

    if keep_best <= 0 or val is None or not math.isfinite(float(val)):
        return False
    best = _scan_best(Path(save_dir)) if Path(save_dir).exists() else []
    if len(best) < keep_best:
        return True
    worst = (min if maximize else max)(b[0] for b in best)
    return val >= worst if maximize else val <= worst


def _rotate_best(d: Path, src: Path, step: int, val: float, keep_best: int,
                 maximize: bool) -> None:
    """`--keep-best-checkpoints` metric rotation, semantics of fairseq
    `checkpoint_utils.py:83-104` + `:112-127` (used by the reference recipe
    `researches/ctc_unity/train_scripts/train.simul-s2st.sh:23-33`): a new
    checkpoint is copied to checkpoint.best_<metric>_<step> only when its
    validation metric beats the current WORST kept best (or fewer than N are
    kept), then everything beyond the N best is removed. Copies are hardlink
    trees (the orbax array files are immutable once written), so a kept best
    costs directory entries, not storage.

    The metric is embedded in the directory name with ``repr`` (exact float
    round-trip) — a rounded rendering would make later comparisons run
    against the rounded value, wrongly rejecting genuinely-better ties. A
    non-finite metric (diverged validation) never enters the rotation: its
    name would not parse back, leaving an unprunable hardlink tree per
    validation."""
    import math
    import os
    import shutil

    if not math.isfinite(val):
        return

    best = _scan_best(d)

    def better(a: float, b: float) -> bool:
        return a >= b if maximize else a <= b

    if best:
        worst = (min if maximize else max)(b[0] for b in best)
        if len(best) >= keep_best and not better(val, worst):
            return
    dst = d / f"checkpoint.best_{val!r}_{step}"
    if not dst.exists():
        shutil.copytree(src, dst, copy_function=os.link)
        best.append((val, step, dst))
    # prune: keep the N best by metric (ties: prefer the newer step, like the
    # reference's random tiebreak suffix keeps later saves distinct)
    best.sort(key=lambda t: (-t[0] if maximize else t[0], -t[1]))
    for _, _, p in best[keep_best:]:
        shutil.rmtree(p, ignore_errors=True)


def best_checkpoint(save_dir: str, maximize: bool = False) -> Optional[str]:
    """Path of the best kept checkpoint from the --keep-best-checkpoints
    rotation (the analogue of fairseq's checkpoint_best.pt), or None."""
    d = Path(save_dir)
    if not d.exists():
        return None
    best = _scan_best(d)
    if not best:
        return None
    best.sort(key=lambda t: (-t[0] if maximize else t[0], -t[1]))
    return str(best[0][2])


def latest_checkpoint(save_dir: str) -> Optional[str]:
    d = Path(save_dir)
    if not d.exists():
        return None
    ckpts = sorted(d.glob("checkpoint_*"),
                   key=lambda p: int(p.name.split("_")[-1]))
    return str(ckpts[-1]) if ckpts else None


def load_model_ensemble(paths) -> list:
    """Load N native checkpoints as ensemble members — the fairseq
    `load_model_ensemble` equivalent (`fairseq/fairseq/checkpoint_utils.py:288`
    loads N .pt files into N modules for EnsembleModel). Returns a list of
    `{"params", "batch_stats"}` dicts for `generation.EnsembleGenerator`,
    which stacks them on a member axis (structure mismatch raises there)."""
    out = []
    for p in paths:
        r = load_checkpoint(str(p))
        out.append({"params": r["params"],
                    "batch_stats": r.get("batch_stats", {})})
    return out


def load_checkpoint(path: str, target=None) -> Dict[str, Any]:
    import jax
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        payload = {
            "params": target.params, "batch_stats": target.batch_stats,
            "opt_state": target.opt_state, "step": target.step,
        }
        return ckptr.restore(Path(path).absolute(), item=payload)
    try:
        return ckptr.restore(Path(path).absolute())
    except ValueError:
        # cross-topology restore (e.g. trained on a pod / saved on CPU, served
        # on one chip): the recorded shardings don't resolve on this backend —
        # re-restore everything as host numpy; jit puts it on device on use
        tree = ckptr.metadata(Path(path).absolute()).item_metadata
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
        return ckptr.restore(Path(path).absolute(),
                             restore_args=restore_args)


def average_checkpoints(paths) -> Dict[str, Any]:
    """Average model params across checkpoints — semantics of
    `fairseq/scripts/average_checkpoints.py:17-65`: float params are the
    element-wise mean; non-float leaves (and batch_stats / opt_state / step)
    are copied from the FIRST checkpoint."""
    import jax

    assert len(paths) >= 1
    payloads = [load_checkpoint(str(p)) for p in paths]
    first = payloads[0]

    structs = {jax.tree.structure(p["params"]) for p in payloads}
    if len(structs) != 1:
        raise KeyError("checkpoints have mismatched param trees "
                       "(average_checkpoints.py:50 raises KeyError too)")

    n = len(payloads)

    def avg(*leaves):
        x0 = np.asarray(leaves[0])
        if np.issubdtype(x0.dtype, np.floating):
            acc = np.zeros(x0.shape, np.float64)
            for leaf in leaves:
                acc += np.asarray(leaf, np.float64)
            return (acc / n).astype(x0.dtype)
        return x0  # int leaves: fairseq floor-divides the sum; none in our trees

    params = jax.tree.map(avg, *[p["params"] for p in payloads])
    return {**first, "params": params}


def load_pretrained_component(variables: Dict[str, Any], checkpoint_path: str,
                              component: str, strict: bool = True
                              ) -> Dict[str, Any]:
    """Graft one tower (e.g. "encoder", "mt_decoder", "unit_decoder") of a saved
    checkpoint into fresh variables — fairseq's
    `load_pretrained_component_from_model` (`checkpoint_utils.py:821-851`).
    Accepts native orbax checkpoints or reference fairseq .pt files."""
    import jax

    if Path(checkpoint_path).is_file():  # reference .pt
        params_src, bs_src, _ = import_fairseq_streamspeech(checkpoint_path)
        payload = {"params": params_src, "batch_stats": bs_src}
    else:
        payload = load_checkpoint(checkpoint_path)
    if component not in payload["params"]:
        raise KeyError(f"checkpoint has no component {component!r}")
    sub = payload["params"][component]
    if strict:
        want = jax.tree.structure(variables["params"][component])
        have = jax.tree.structure(jax.tree.map(np.asarray, sub))
        if want != have:
            raise ValueError(
                f"component {component!r} structure mismatch:\n{want}\nvs\n{have}")
    out = {k: dict(v) if isinstance(v, dict) else v
           for k, v in variables.items()}
    out["params"] = dict(variables["params"])
    out["params"][component] = sub
    bs = payload.get("batch_stats") or {}
    if component in bs and "batch_stats" in variables:
        out["batch_stats"] = dict(variables.get("batch_stats", {}))
        out["batch_stats"][component] = bs[component]
    return out


# ---------------------------------------------------------------------------
# fairseq .pt import
# ---------------------------------------------------------------------------


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def _linear(sd, name, out: Dict[str, Any], bias=True):
    out["kernel"] = _t(sd[f"{name}.weight"]).T
    if bias and f"{name}.bias" in sd:
        out["bias"] = _t(sd[f"{name}.bias"])
    return out


def _ln(sd, name):
    return {"scale": _t(sd[f"{name}.weight"]), "bias": _t(sd[f"{name}.bias"])}


def _mha(sd, name):
    """fairseq MultiheadAttention {k,v,q,out}_proj."""
    return {p: _linear(sd, f"{name}.{p}", {})
            for p in ("q_proj", "k_proj", "v_proj", "out_proj")}


def _espnet_relpos_attn(sd, name):
    """espnet RelPositionMultiHeadedAttention linear_{q,k,v,out,pos} + biases."""
    out = {
        "q_proj": _linear(sd, f"{name}.linear_q", {}),
        "k_proj": _linear(sd, f"{name}.linear_k", {}),
        "v_proj": _linear(sd, f"{name}.linear_v", {}),
        "out_proj": _linear(sd, f"{name}.linear_out", {}),
        "linear_pos": {"kernel": _t(sd[f"{name}.linear_pos.weight"]).T},
        "pos_bias_u": _t(sd[f"{name}.pos_bias_u"]),
        "pos_bias_v": _t(sd[f"{name}.pos_bias_v"]),
    }
    return out


def _ffn_conformer(sd, name):
    return {
        "layer_norm": _ln(sd, f"{name}.layer_norm"),
        "w_1": _linear(sd, f"{name}.w_1", {}),
        "w_2": _linear(sd, f"{name}.w_2", {}),
    }


def _decoder_layer(sd, name):
    return {
        "self_attn": _mha(sd, f"{name}.self_attn"),
        "self_attn_layer_norm": _ln(sd, f"{name}.self_attn_layer_norm"),
        "encoder_attn": _mha(sd, f"{name}.encoder_attn"),
        "encoder_attn_layer_norm": _ln(sd, f"{name}.encoder_attn_layer_norm"),
        "ffn": {"fc1": _linear(sd, f"{name}.fc1", {}),
                "fc2": _linear(sd, f"{name}.fc2", {})},
        "final_layer_norm": _ln(sd, f"{name}.final_layer_norm"),
    }


def _encoder_layer_t2u(sd, name):
    return {
        "self_attn": _mha(sd, f"{name}.self_attn"),
        "self_attn_layer_norm": _ln(sd, f"{name}.self_attn_layer_norm"),
        "ffn": {"fc1": _linear(sd, f"{name}.fc1", {}),
                "fc2": _linear(sd, f"{name}.fc2", {})},
        "final_layer_norm": _ln(sd, f"{name}.final_layer_norm"),
    }


def _count_layers(sd, prefix: str) -> int:
    pat = re.compile(re.escape(prefix) + r"\.(\d+)\.")
    idx = {int(m.group(1)) for k in sd for m in [pat.match(k)] if m}
    return max(idx) + 1 if idx else 0


def import_fairseq_streamspeech(path: str) -> Tuple[Dict, Dict, Dict]:
    """Load a reference StreamSpeech .pt → (params, batch_stats, embedded_cfg).

    Checkpoint layout per `checkpoint_utils.py:288` ({"model": sd, "cfg": cfg, ...});
    tower names per `researches/ctc_unity/models/streamspeech_model.py:183-268`.
    """
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    sd = state["model"] if "model" in state else state
    cfg = state.get("cfg", {})

    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    # encoder
    enc: Dict[str, Any] = {"subsample": {}, "linear": _linear(sd, "encoder.linear", {})}
    enc_bs: Dict[str, Any] = {}
    n_sub = _count_layers(sd, "encoder.subsample.conv_layers")
    for i in range(n_sub):
        w = _t(sd[f"encoder.subsample.conv_layers.{i}.weight"])  # [out, in, k]
        enc["subsample"][f"conv_{i}"] = {
            "weight": w.transpose(2, 1, 0),
            "bias": _t(sd[f"encoder.subsample.conv_layers.{i}.bias"]),
        }
    n_layers = _count_layers(sd, "encoder.conformer_layers")
    for i in range(n_layers):
        p = f"encoder.conformer_layers.{i}"
        dw = _t(sd[f"{p}.conv_module.depthwise_conv.weight"])  # [C, 1, k]
        layer = {
            "ffn1": _ffn_conformer(sd, f"{p}.ffn1"),
            "self_attn_layer_norm": _ln(sd, f"{p}.self_attn_layer_norm"),
            "self_attn": _espnet_relpos_attn(sd, f"{p}.self_attn"),
            "conv_module": {
                "layer_norm": _ln(sd, f"{p}.conv_module.layer_norm"),
                "pointwise_conv1": {
                    "kernel": _t(sd[f"{p}.conv_module.pointwise_conv1.weight"]
                                 )[:, :, 0].T},
                "depthwise_conv": {"weight": dw[:, 0, :].T},
                "batch_norm": {
                    "scale": _t(sd[f"{p}.conv_module.batch_norm.weight"]),
                    "bias": _t(sd[f"{p}.conv_module.batch_norm.bias"]),
                },
                "pointwise_conv2": {
                    "kernel": _t(sd[f"{p}.conv_module.pointwise_conv2.weight"]
                                 )[:, :, 0].T},
            },
            "ffn2": _ffn_conformer(sd, f"{p}.ffn2"),
            "final_layer_norm": _ln(sd, f"{p}.final_layer_norm"),
        }
        enc[f"layers_{i}"] = layer
        enc_bs[f"layers_{i}"] = {"conv_module": {"batch_norm": {
            "mean": _t(sd[f"{p}.conv_module.batch_norm.running_mean"]),
            "var": _t(sd[f"{p}.conv_module.batch_norm.running_var"]),
        }}}
    params["encoder"] = enc
    batch_stats["encoder"] = enc_bs

    # CTC heads
    for ours, theirs in [("source_unigram_head", "source_unigram_decoder"),
                         ("ctc_target_unigram_head", "ctc_target_unigram_decoder")]:
        if f"{theirs}.proj.weight" in sd:
            params[ours] = {"proj": _linear(sd, f"{theirs}.proj", {})}

    # MT decoder
    mt = {"embed_tokens": _t(sd["target_unigram_decoder.embed_tokens.weight"])}
    for i in range(_count_layers(sd, "target_unigram_decoder.layers")):
        mt[f"layers_{i}"] = _decoder_layer(sd, f"target_unigram_decoder.layers.{i}")
    if "target_unigram_decoder.layer_norm.weight" in sd:
        mt["layer_norm"] = _ln(sd, "target_unigram_decoder.layer_norm")
    params["mt_decoder"] = mt

    # T2U synthesizer encoder
    if "synthesizer_encoder.layer_norm.weight" in sd:
        t2u = {"layer_norm": _ln(sd, "synthesizer_encoder.layer_norm")}
        for i in range(_count_layers(sd, "synthesizer_encoder.layers")):
            t2u[f"layers_{i}"] = _encoder_layer_t2u(
                sd, f"synthesizer_encoder.layers.{i}")
        params["synthesizer_encoder"] = t2u

    # NAR unit decoder
    ud = {"embed_tokens": _t(sd["decoder.embed_tokens.weight"])}
    for i in range(_count_layers(sd, "decoder.layers")):
        ud[f"layers_{i}"] = _decoder_layer(sd, f"decoder.layers.{i}")
    if "decoder.layer_norm.weight" in sd:
        ud["layer_norm"] = _ln(sd, "decoder.layer_norm")
    params["unit_decoder"] = ud

    return params, batch_stats, cfg


def infer_config_from_params(params: Dict, batch_stats: Dict):
    """Reconstruct a StreamSpeechConfig from imported parameter shapes — robust
    against the omegaconf blob embedded in reference checkpoints (which needs
    fairseq to deserialize). Everything the flax modules need is in the shapes."""
    from streamspeech_tpu.config import StreamSpeechConfig

    cfg = StreamSpeechConfig.simul_s2st()
    enc = params["encoder"]
    cfg.encoder.layers = sum(1 for k in enc if k.startswith("layers_"))
    cfg.encoder.embed_dim = enc["linear"]["kernel"].shape[1]
    l0 = enc["layers_0"]
    cfg.encoder.ffn_embed_dim = l0["ffn1"]["w_1"]["kernel"].shape[1]
    cfg.encoder.attention_heads = l0["self_attn"]["pos_bias_u"].shape[0]
    cfg.encoder.depthwise_conv_kernel_size = \
        l0["conv_module"]["depthwise_conv"]["weight"].shape[0]
    sub = enc["subsample"]
    cfg.encoder.conv_kernel_sizes = [
        sub[f"conv_{i}"]["weight"].shape[0] for i in range(len(sub))]
    cfg.encoder.conv_channels = sub["conv_0"]["weight"].shape[2]

    mt = params["mt_decoder"]
    cfg.mt_decoder.vocab_size, cfg.mt_decoder.embed_dim = \
        mt["embed_tokens"].shape
    cfg.mt_decoder.layers = sum(1 for k in mt if k.startswith("layers_"))
    cfg.mt_decoder.ffn_embed_dim = \
        mt["layers_0"]["ffn"]["fc1"]["kernel"].shape[1]
    cfg.mt_decoder.normalize_before = "layer_norm" in mt
    cfg.translation_decoder_layers = cfg.mt_decoder.layers

    ud = params["unit_decoder"]
    cfg.unit_decoder.vocab_size, cfg.unit_decoder.embed_dim = \
        ud["embed_tokens"].shape
    cfg.unit_decoder.layers = sum(1 for k in ud if k.startswith("layers_"))
    cfg.unit_decoder.ffn_embed_dim = \
        ud["layers_0"]["ffn"]["fc1"]["kernel"].shape[1]
    cfg.target_code_size = cfg.unit_decoder.vocab_size - 5  # 4 specials + blank

    if "synthesizer_encoder" in params:
        cfg.synthesizer_encoder_layers = sum(
            1 for k in params["synthesizer_encoder"] if k.startswith("layers_"))
    else:
        cfg.synthesizer_encoder_layers = 0
    if "source_unigram_head" in params:
        cfg.source_unigram_vocab = \
            params["source_unigram_head"]["proj"]["kernel"].shape[1]
    if "ctc_target_unigram_head" in params:
        cfg.ctc_target_unigram_vocab = \
            params["ctc_target_unigram_head"]["proj"]["kernel"].shape[1]
    return cfg


def export_fairseq_streamspeech(params: Dict, batch_stats: Dict) -> Dict[str, np.ndarray]:
    """Inverse of import_fairseq_streamspeech: my pytree → fairseq state-dict
    names/layouts. Lets users continue training released checkpoints in either
    framework; import(export(x)) == x is tested."""
    sd: Dict[str, np.ndarray] = {}

    def put_linear(name, p):
        sd[f"{name}.weight"] = np.asarray(p["kernel"]).T
        if "bias" in p:
            sd[f"{name}.bias"] = np.asarray(p["bias"])

    def put_ln(name, p):
        sd[f"{name}.weight"] = np.asarray(p["scale"])
        sd[f"{name}.bias"] = np.asarray(p["bias"])

    enc = params["encoder"]
    for key, sub in enc["subsample"].items():
        i = key.split("_")[-1]
        sd[f"encoder.subsample.conv_layers.{i}.weight"] = \
            np.asarray(sub["weight"]).transpose(2, 1, 0)
        sd[f"encoder.subsample.conv_layers.{i}.bias"] = np.asarray(sub["bias"])
    put_linear("encoder.linear", enc["linear"])
    for key, layer in enc.items():
        if not key.startswith("layers_"):
            continue
        i = key.split("_")[-1]
        p = f"encoder.conformer_layers.{i}"
        for ffn in ("ffn1", "ffn2"):
            put_ln(f"{p}.{ffn}.layer_norm", layer[ffn]["layer_norm"])
            put_linear(f"{p}.{ffn}.w_1", layer[ffn]["w_1"])
            put_linear(f"{p}.{ffn}.w_2", layer[ffn]["w_2"])
        put_ln(f"{p}.self_attn_layer_norm", layer["self_attn_layer_norm"])
        a = layer["self_attn"]
        for ours, theirs in [("q_proj", "linear_q"), ("k_proj", "linear_k"),
                             ("v_proj", "linear_v"), ("out_proj", "linear_out")]:
            put_linear(f"{p}.self_attn.{theirs}", a[ours])
        sd[f"{p}.self_attn.linear_pos.weight"] = \
            np.asarray(a["linear_pos"]["kernel"]).T
        sd[f"{p}.self_attn.pos_bias_u"] = np.asarray(a["pos_bias_u"])
        sd[f"{p}.self_attn.pos_bias_v"] = np.asarray(a["pos_bias_v"])
        cm = layer["conv_module"]
        put_ln(f"{p}.conv_module.layer_norm", cm["layer_norm"])
        sd[f"{p}.conv_module.pointwise_conv1.weight"] = \
            np.asarray(cm["pointwise_conv1"]["kernel"]).T[:, :, None]
        sd[f"{p}.conv_module.depthwise_conv.weight"] = \
            np.asarray(cm["depthwise_conv"]["weight"]).T[:, None, :]
        sd[f"{p}.conv_module.batch_norm.weight"] = \
            np.asarray(cm["batch_norm"]["scale"])
        sd[f"{p}.conv_module.batch_norm.bias"] = \
            np.asarray(cm["batch_norm"]["bias"])
        bs = batch_stats["encoder"][key]["conv_module"]["batch_norm"]
        sd[f"{p}.conv_module.batch_norm.running_mean"] = np.asarray(bs["mean"])
        sd[f"{p}.conv_module.batch_norm.running_var"] = np.asarray(bs["var"])
        sd[f"{p}.conv_module.pointwise_conv2.weight"] = \
            np.asarray(cm["pointwise_conv2"]["kernel"]).T[:, :, None]
        put_ln(f"{p}.final_layer_norm", layer["final_layer_norm"])

    for ours, theirs in [("source_unigram_head", "source_unigram_decoder"),
                         ("ctc_target_unigram_head", "ctc_target_unigram_decoder")]:
        if ours in params:
            put_linear(f"{theirs}.proj", params[ours]["proj"])

    def put_decoder(tree, prefix, layer_fn):
        if "embed_tokens" in tree:
            sd[f"{prefix}.embed_tokens.weight"] = np.asarray(tree["embed_tokens"])
        for key, layer in tree.items():
            if key.startswith("layers_"):
                layer_fn(layer, f"{prefix}.layers.{key.split('_')[-1]}")
        if "layer_norm" in tree:
            put_ln(f"{prefix}.layer_norm", tree["layer_norm"])

    def dec_layer(layer, p):
        for attn in ("self_attn", "encoder_attn"):
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                put_linear(f"{p}.{attn}.{proj}", layer[attn][proj])
            put_ln(f"{p}.{attn}_layer_norm", layer[f"{attn}_layer_norm"])
        put_linear(f"{p}.fc1", layer["ffn"]["fc1"])
        put_linear(f"{p}.fc2", layer["ffn"]["fc2"])
        put_ln(f"{p}.final_layer_norm", layer["final_layer_norm"])

    def enc_layer(layer, p):
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            put_linear(f"{p}.self_attn.{proj}", layer["self_attn"][proj])
        put_ln(f"{p}.self_attn_layer_norm", layer["self_attn_layer_norm"])
        put_linear(f"{p}.fc1", layer["ffn"]["fc1"])
        put_linear(f"{p}.fc2", layer["ffn"]["fc2"])
        put_ln(f"{p}.final_layer_norm", layer["final_layer_norm"])

    put_decoder(params["mt_decoder"], "target_unigram_decoder", dec_layer)
    if "synthesizer_encoder" in params:
        put_decoder(params["synthesizer_encoder"], "synthesizer_encoder",
                    enc_layer)
    put_decoder(params["unit_decoder"], "decoder", dec_layer)
    return sd


def import_hubert(path: str) -> Dict:
    """Released (m)HuBERT fairseq checkpoint → params for models.hubert.HubertModel
    (the mHuBERT feature extractor the preprocess pipeline uses, SURVEY §2.8)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    sd = state["model"] if "model" in state else state

    params: Dict[str, Any] = {}
    fe: Dict[str, Any] = {}
    n_conv = _count_layers(sd, "feature_extractor.conv_layers")
    for i in range(n_conv):
        w = _t(sd[f"feature_extractor.conv_layers.{i}.0.weight"])  # [out,in,k]
        fe[f"conv{i}_w"] = w.transpose(2, 1, 0)
    if "feature_extractor.conv_layers.0.2.weight" in sd:
        fe["group_norm"] = {
            "scale": _t(sd["feature_extractor.conv_layers.0.2.weight"]),
            "bias": _t(sd["feature_extractor.conv_layers.0.2.bias"]),
        }
    params["feature_extractor"] = fe
    params["layer_norm_extract"] = _ln(sd, "layer_norm")
    params["post_extract_proj"] = _linear(sd, "post_extract_proj", {})

    # pos conv is weight-normed over dim=2 (per kernel position)
    g = _t(sd["encoder.pos_conv.0.weight_g"])          # [1, 1, K]
    v = _t(sd["encoder.pos_conv.0.weight_v"])          # [Cout, Cin/g, K]
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    w = (g * v / np.maximum(norm, 1e-12))
    params["pos_conv_w"] = w.transpose(2, 1, 0)        # [K, Cin/g, Cout]
    params["pos_conv_b"] = _t(sd["encoder.pos_conv.0.bias"])
    params["encoder_layer_norm"] = _ln(sd, "encoder.layer_norm")

    for i in range(_count_layers(sd, "encoder.layers")):
        p = f"encoder.layers.{i}"
        params[f"layers_{i}"] = {
            "self_attn": _mha(sd, f"{p}.self_attn"),
            "self_attn_layer_norm": _ln(sd, f"{p}.self_attn_layer_norm"),
            "fc1": _linear(sd, f"{p}.fc1", {}),
            "fc2": _linear(sd, f"{p}.fc2", {}),
            "final_layer_norm": _ln(sd, f"{p}.final_layer_norm"),
        }
    return {"params": params}


# ---------------------------------------------------------------------------
# HiFi-GAN vocoder import
# ---------------------------------------------------------------------------


def _fold_weight_norm(sd, name) -> np.ndarray:
    """weight = g * v / ||v|| with the norm over all dims except 0 (torch
    weight_norm default dim=0)."""
    if f"{name}.weight" in sd:
        return _t(sd[f"{name}.weight"])
    g = _t(sd[f"{name}.weight_g"])
    v = _t(sd[f"{name}.weight_v"])
    norm = np.sqrt((v ** 2).reshape(v.shape[0], -1).sum(1)).reshape(
        (-1,) + (1,) * (v.ndim - 1))
    return g * v / np.maximum(norm, 1e-12)


def import_hifigan_vocoder(checkpoint_path: str, config_path: str
                           ) -> Tuple[Dict, Dict]:
    """Reference vocoder ckpt {"generator": sd} (`agent/tts/vocoder.py:38-41`) →
    (vocoder params for models.vocoder.CodeGenerator, config dict)."""
    import torch

    cfg = json.loads(Path(config_path).read_text())
    sd = torch.load(checkpoint_path, map_location="cpu",
                    weights_only=False)["generator"]

    params: Dict[str, Any] = {}
    gen: Dict[str, Any] = {}
    gen["conv_pre_w"] = _fold_weight_norm(sd, "conv_pre").transpose(2, 1, 0)
    gen["conv_pre_b"] = _t(sd["conv_pre.bias"])
    n_up = len(cfg["upsample_rates"])
    for i in range(n_up):
        # ConvTranspose1d weight layout [Cin, Cout, K] → [K, Cin, Cout]
        w = _fold_weight_norm(sd, f"ups.{i}").transpose(2, 0, 1)
        gen[f"ups_{i}_w"] = w
        gen[f"ups_{i}_b"] = _t(sd[f"ups.{i}.bias"])
    n_kernels = len(cfg["resblock_kernel_sizes"])
    n_res = n_up * n_kernels
    for r in range(n_res):
        rb: Dict[str, Any] = {}
        n_dil = len(cfg["resblock_dilation_sizes"][r % n_kernels])
        for j in range(n_dil):
            for br in ("convs1", "convs2"):
                w = _fold_weight_norm(sd, f"resblocks.{r}.{br}.{j}").transpose(2, 1, 0)
                rb[f"{br}_{j}_w"] = w
                rb[f"{br}_{j}_b"] = _t(sd[f"resblocks.{r}.{br}.{j}.bias"])
        gen[f"resblocks_{r}"] = rb
    gen["conv_post_w"] = _fold_weight_norm(sd, "conv_post").transpose(2, 1, 0)
    gen["conv_post_b"] = _t(sd["conv_post.bias"])
    params["generator"] = gen

    params["dict"] = {"embedding": _t(sd["dict.weight"])}
    if "dur_predictor.conv1.0.weight" in sd:
        dp = {
            "conv1_w": _t(sd["dur_predictor.conv1.0.weight"]).transpose(2, 1, 0),
            "conv1_b": _t(sd["dur_predictor.conv1.0.bias"]),
            "ln1": {"scale": _t(sd["dur_predictor.ln1.weight"]),
                    "bias": _t(sd["dur_predictor.ln1.bias"])},
            "conv2_w": _t(sd["dur_predictor.conv2.0.weight"]).transpose(2, 1, 0),
            "conv2_b": _t(sd["dur_predictor.conv2.0.bias"]),
            "ln2": {"scale": _t(sd["dur_predictor.ln2.weight"]),
                    "bias": _t(sd["dur_predictor.ln2.bias"])},
            "proj": {"kernel": _t(sd["dur_predictor.proj.weight"]).T,
                     "bias": _t(sd["dur_predictor.proj.bias"])},
        }
        params["dur_predictor"] = dp
    return {"params": params}, cfg
