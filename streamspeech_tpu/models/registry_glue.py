"""Model registry glue: build any registered architecture by name.

The reference selects models via fairseq's `@register_model`/arch registries
(`researches/ctc_unity/models/streamspeech_model.py:57`); here ARCHS maps arch
names to config builders and MODELS maps families to flax module classes, so
`build("streamspeech")` or `build("chunk_unity_conformer")` works the same way
`--arch` does there.
"""

from __future__ import annotations

from typing import Optional

from streamspeech_tpu.config import StreamSpeechConfig
from streamspeech_tpu.registry import ARCHS, MODELS

# import side effects: register arch functions
import streamspeech_tpu.models.unity  # noqa: F401


@MODELS.register("streamspeech")
def _streamspeech(cfg):
    from streamspeech_tpu.models.streamspeech import StreamSpeechModel

    return StreamSpeechModel(cfg)


@MODELS.register("unity")
def _unity(cfg):
    from streamspeech_tpu.models.unity import UnitYModel

    return UnitYModel(cfg)


@MODELS.register("translatotron2")
def _translatotron2(cfg):
    from streamspeech_tpu.models.translatotron import Translatotron2Model

    return Translatotron2Model(cfg)


_ARCH_TO_FAMILY = {
    "streamspeech": "streamspeech",
    "streamspeech_cascade": "streamspeech",
    "chunk_unity_conformer": "unity",
    "uni_unity_conformer": "unity",
    "s2spect2_conformer": "translatotron2",
}


def build(arch: str, cfg: Optional[StreamSpeechConfig] = None):
    """arch name → (configured model module, config)."""
    if arch in ARCHS:
        cfg = ARCHS.get(arch)(cfg)
    elif cfg is None:
        cfg = StreamSpeechConfig.simul_s2st()
    family = _ARCH_TO_FAMILY.get(arch, "streamspeech")
    return MODELS.get(family)(cfg), cfg
