"""streamspeech_tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework for simultaneous
speech-to-speech translation with the capabilities of ictnlp/StreamSpeech.

Top-level layout (mirrors SURVEY.md section 2 of the reference, redesigned TPU-first):

- ``ops``      jittable primitives: fbank frontend, CMVN, SpecAugment, masks, attention,
               chunk-causal convolutions, CTC loss / greedy decode, positional encodings.
- ``models``   flax model zoo: chunk Conformer encoder, MT transformer decoder, T2U
               encoder, NAR upsampling unit-CTC decoder, CTC heads, unit HiFi-GAN vocoder.
- ``parallel`` device mesh + sharding rules (dp/fsdp/tp) and collectives helpers.
- ``data``     manifests, audio IO, batching, feature transforms, dictionaries.
- ``train``    criterion, LR schedules, pjit trainer, checkpointing (orbax + torch import).
- ``runtime``  streaming state (ring-buffer KV/conv caches) + incremental jitted steps.
- ``agents``   SimulEval-compatible streaming policies (S2ST/S2TT/ASR, wait-k baselines).
- ``eval``     sentence-level streaming evaluator + latency/quality scorers.
"""

__version__ = "0.1.0"
