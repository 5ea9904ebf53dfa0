from streamspeech_tpu.ops.masks import (  # noqa: F401
    causal_allowed,
    chunk_allowed,
    waitk_allowed,
    lengths_to_mask,
)
