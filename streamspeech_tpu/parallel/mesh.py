"""Device-mesh construction.

TPU-native replacement for the reference's torch.distributed process-group
bootstrap (`fairseq/fairseq/distributed/utils.py:46-348`): JAX owns process/device
discovery, so "distributed init" reduces to choosing a mesh shape. Axes:

- ``data``  : batch (DP) and, with fsdp=True, parameter shards (ZeRO/FSDP style —
              the reference's fairscale FSDP wrapper, `distributed/fully_sharded_...`).
- ``model`` : tensor parallelism (attention heads / FFN hidden — the reference's
              Megatron path, `fairseq/fairseq/model_parallel/`).

Collectives ride ICI within a slice automatically once shardings are annotated;
there is no NCCL-style wrapper layer to port.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))
