import os
import sys

# Virtual 8-device CPU mesh for sharding tests (SURVEY.md §4 implication (d)).
# NOTE: this environment pre-imports jax via sitecustomize with a remote-TPU
# plugin (JAX_PLATFORMS=axon), so env vars set here are too late — force the
# platform through jax.config instead. Running tests against the remote chip
# would make every eager op a network roundtrip.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
