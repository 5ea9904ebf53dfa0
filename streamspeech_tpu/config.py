"""Configuration dataclasses + YAML loaders.

Mirrors the reference's three config surfaces (SURVEY.md §5 "Config / flag system"):
- model/arch hyperparameters (fairseq argparse arch presets,
  `researches/ctc_unity/models/streamspeech_model.py:418-430`) → :class:`StreamSpeechConfig`;
- the data YAML `config_gcmvn.yaml` (features/transforms/gcmvn/vocoder,
  `fairseq/fairseq/data/audio/data_cfg.py:193`) → :class:`S2SDataConfig`;
- the multitask YAML `config_mtl_asr_st_ctcst.yaml`
  (`fairseq/fairseq/data/audio/data_cfg.py:244`) → :class:`MultitaskConfig`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional

import yaml


# ---------------------------------------------------------------------------
# Model architecture
# ---------------------------------------------------------------------------


@dataclass
class EncoderConfig:
    """Chunk Conformer encoder (`researches/chunk_unity/models/s2t_conformer.py:37`)."""

    input_feat_per_channel: int = 80
    input_channels: int = 1
    conv_kernel_sizes: List[int] = field(default_factory=lambda: [5, 5])
    conv_channels: int = 1024
    embed_dim: int = 256
    ffn_embed_dim: int = 2048
    layers: int = 16
    attention_heads: int = 4
    depthwise_conv_kernel_size: int = 31
    pos_enc_type: str = "rel_pos"  # "rel_pos" | "rope" | "abs" (conformer_layer.py:207-227)
    attn_type: str = "espnet"
    max_source_positions: int = 6000
    dropout: float = 0.1
    # streaming
    chunk_size: Optional[int] = 8  # post-subsample frames per chunk; None = offline
    unidirectional: bool = True
    no_scale_embedding: bool = False
    # target-speaker conditioning (`chunk_unity/models/s2s_conformer.py:37-65`)
    speaker_embed_dim: Optional[int] = None
    # rematerialize each conformer layer in the backward pass
    # (jax.checkpoint): trades recompute FLOPs for activation HBM traffic —
    # the train step is memory-bound (docs/training.md roofline), so this is
    # usually a win on TPU; numerics identical
    remat: bool = False


@dataclass
class DecoderConfig:
    """Transformer decoder tower (MT first pass or aux transformer decoder)."""

    embed_dim: int = 512
    ffn_embed_dim: int = 2048
    layers: int = 4
    attention_heads: int = 8
    dropout: float = 0.1
    max_target_positions: int = 1024
    share_input_output_embed: bool = True
    learned_pos: bool = False
    normalize_before: bool = True
    no_scale_embedding: bool = False
    layernorm_embedding: bool = False
    vocab_size: int = 0  # filled from dictionary
    # BASE expert layers interleaved into the stack (reference: fairseq
    # builds one BaseLayer per `args.base_layers` at position
    # ((i+1)*decoder_layers)//(base_layers+1), `transformer_decoder.py` /
    # `base_layer.py:14`; expert count = data-parallel world size there,
    # an explicit knob here)
    base_layers: int = 0
    base_num_experts: int = 8


@dataclass
class UnitDecoderConfig:
    """NAR upsampling unit-CTC decoder (`researches/ctc_unity/modules/ctc_transformer_unit_decoder.py:25`).
    Defaults follow train.simul-s2st.sh: --decoder-layers 2 --decoder-embed-dim 512
    --decoder-ffn-embed-dim 2048 --decoder-attention-heads 8."""

    embed_dim: int = 512
    ffn_embed_dim: int = 2048
    layers: int = 2
    attention_heads: int = 8
    dropout: float = 0.1
    ctc_upsample_rate: int = 25
    n_frames_per_step: int = 1
    max_target_positions: int = 8192
    vocab_size: int = 0  # units + specials + blank
    # rematerialize each decoder layer in the backward pass (see
    # EncoderConfig.remat) — the unit stack runs at T = mt_len × upsample
    # (1200 at the bench shape), the most activation-heavy part of the step
    remat: bool = False


@dataclass
class MultitaskTaskConfig:
    """One aux task from config_mtl_asr_st_ctcst.yaml (`data_cfg.py:244`)."""

    task_name: str = ""
    decoder_type: str = "ctc"  # "ctc" | "transformer"
    dict_path: str = ""
    data: str = ""
    loss_weight: float = 1.0
    rdrop_alpha: float = 0.0
    label_smoothing: float = 0.1
    decoder_layers: int = 0
    decoder_embed_dim: int = 512
    decoder_ffn_embed_dim: int = 2048
    decoder_attention_heads: int = 8
    input_from: str = "encoder"  # "encoder" | "decoder"
    is_first_pass_decoder: bool = False


@dataclass
class StreamSpeechConfig:
    """Full model assembly (`researches/ctc_unity/models/streamspeech_model.py:57`)."""

    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    mt_decoder: DecoderConfig = field(default_factory=DecoderConfig)
    unit_decoder: UnitDecoderConfig = field(default_factory=UnitDecoderConfig)
    synthesizer_encoder_layers: int = 2
    translation_decoder_layers: int = 4
    target_code_size: int = 1000
    multitasks: List[MultitaskTaskConfig] = field(default_factory=list)
    # sizes of aux vocabularies (filled from dictionaries at build time)
    source_unigram_vocab: int = 0
    ctc_target_unigram_vocab: int = 0
    # cascade variant: T2U consumes re-embedded MT output tokens
    cascade: bool = False
    # UnitY --synthesizer-augmented-cross-attention: the AR unit decoder also
    # cross-attends to the speech encoder output (`s2s_conformer_unity.py:258`)
    t2u_augmented_cross_attn: bool = False
    dtype: str = "float32"  # compute dtype: "float32" | "bfloat16"

    @classmethod
    def simul_s2st(cls) -> "StreamSpeechConfig":
        """train.simul-s2st.sh hyperparameters."""
        cfg = cls()
        cfg.encoder.chunk_size = 8
        cfg.encoder.unidirectional = True
        cfg.unit_decoder.ctc_upsample_rate = 25
        return cfg

    @classmethod
    def offline_s2st(cls) -> "StreamSpeechConfig":
        cfg = cls()
        cfg.encoder.chunk_size = None
        cfg.encoder.unidirectional = False
        return cfg


# ---------------------------------------------------------------------------
# Data configs (YAML)
# ---------------------------------------------------------------------------


def _load_yaml(path: str) -> Dict[str, Any]:
    with open(path, "r", encoding="utf-8") as f:
        return yaml.safe_load(f) or {}


@dataclass
class S2SDataConfig:
    """Parsed config_gcmvn.yaml. Paths are resolved relative to the yaml dir when
    the absolute path recorded at preprocessing time does not exist (the reference
    hardcodes the author's machine paths)."""

    yaml_dir: Path = field(default_factory=Path)
    input_feat_per_channel: int = 80
    input_channels: int = 1
    global_cmvn_stats_npz: Optional[str] = None
    transforms: Dict[str, List[str]] = field(default_factory=dict)
    specaugment: Dict[str, Any] = field(default_factory=dict)
    vocoder_checkpoint: Optional[str] = None
    vocoder_config: Optional[str] = None
    vocoder_type: str = "code_hifigan"
    target_sample_rate: int = 16000

    def _resolve(self, p: Optional[str]) -> Optional[str]:
        if p is None:
            return None
        if Path(p).exists():
            return p
        cand = self.yaml_dir / Path(p).name
        return str(cand) if cand.exists() else p

    @classmethod
    def load(cls, path: str) -> "S2SDataConfig":
        raw = _load_yaml(path)
        cfg = cls(yaml_dir=Path(path).parent)
        cfg.input_feat_per_channel = raw.get("input_feat_per_channel", 80)
        cfg.input_channels = raw.get("input_channels", 1)
        gc = raw.get("global_cmvn") or {}
        cfg.global_cmvn_stats_npz = cfg._resolve(gc.get("stats_npz_path"))
        cfg.transforms = raw.get("transforms", {})
        cfg.specaugment = raw.get("specaugment", {})
        voc = raw.get("vocoder") or {}
        cfg.vocoder_checkpoint = cfg._resolve(voc.get("checkpoint"))
        cfg.vocoder_config = cfg._resolve(voc.get("config"))
        cfg.vocoder_type = voc.get("type", "code_hifigan")
        return cfg

    def get_transforms(self, split: str) -> List[str]:
        # reference semantics (`data_cfg.py:35`): "_train" key for train splits,
        # "*" for everything else.
        key = "_train" if split.startswith("train") else "*"
        return self.transforms.get(key, self.transforms.get("*", []))


@dataclass
class MultitaskConfig:
    """Parsed config_mtl_asr_st_ctcst.yaml: one MultitaskTaskConfig per top-level key."""

    tasks: Dict[str, MultitaskTaskConfig] = field(default_factory=dict)

    @classmethod
    def load(cls, path: str) -> "MultitaskConfig":
        raw = _load_yaml(path)
        yaml_dir = Path(path).parent
        cfg = cls()
        for name, body in raw.items():
            dargs = body.get("decoder_args", {}) or {}
            t = MultitaskTaskConfig(
                task_name=name,
                decoder_type=body.get("decoder_type", "ctc"),
                dict_path=str(body.get("dict", "")),
                data=str(body.get("data", "")),
                loss_weight=float(body.get("loss_weight", 1.0)),
                rdrop_alpha=float(body.get("rdrop_alpha", 0.0)),
                label_smoothing=float(body.get("label_smoothing", 0.1)),
                decoder_layers=int(dargs.get("decoder_layers", 0)),
                decoder_embed_dim=int(dargs.get("decoder_embed_dim", 512)),
                decoder_ffn_embed_dim=int(dargs.get("decoder_ffn_embed_dim", 2048)),
                decoder_attention_heads=int(dargs.get("decoder_attention_heads", 8)),
                input_from=body.get("input_from", "encoder"),
                # reference convention: the transformer-decoder aux task is the
                # first-pass MT decoder (`tasks/speech_to_speech.py:212-246`)
                is_first_pass_decoder=body.get("decoder_type") == "transformer",
            )
            if t.dict_path and not Path(t.dict_path).exists():
                cand = yaml_dir / Path(t.dict_path).parent.name / Path(t.dict_path).name
                if cand.exists():
                    t.dict_path = str(cand)
            cfg.tasks[name] = t
        return cfg


# ---------------------------------------------------------------------------
# Training config
# ---------------------------------------------------------------------------


@dataclass
class OptimizationConfig:
    """train.simul-s2st.sh: Adam(0.9,0.98) lr 1e-3 inverse_sqrt warmup 10k, clip 10."""

    lr: float = 1e-3
    adam_betas: tuple = (0.9, 0.98)
    adam_eps: float = 1e-8
    weight_decay: float = 0.0
    warmup_updates: int = 10000
    warmup_init_lr: float = 1e-7
    lr_scheduler: str = "inverse_sqrt"
    clip_norm: float = 10.0
    max_update: int = 100000
    update_freq: int = 2
    max_tokens: int = 22000
    label_smoothing: float = 0.1
    dtype: str = "bfloat16"  # compute dtype for the train step


@dataclass
class TrainingConfig:
    model: StreamSpeechConfig = field(default_factory=StreamSpeechConfig.simul_s2st)
    optimization: OptimizationConfig = field(default_factory=OptimizationConfig)
    seed: int = 1
    save_dir: str = "checkpoints"
    save_interval_updates: int = 1000
    keep_last_checkpoints: int = 10
    log_interval: int = 100
    # streaming-mask training (train.simul-s2st.sh: --k1 0 --k2 0 --n1 1 --n2 -1)
    k1: int = 0
    k2: int = 0
    n1: int = 1
    n2: int = -1
    multichunk: bool = True
    # parallelism
    mesh_shape: Dict[str, int] = field(default_factory=lambda: {"data": 1})
    fsdp: bool = False


def to_dict(cfg) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)
