from streamspeech_tpu.parallel.mesh import make_mesh  # noqa: F401
from streamspeech_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    param_shardings,
    replicated,
)
