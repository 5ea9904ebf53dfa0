"""AOT export cache (runtime/aot.py): correctness of the load path that the
serving warmup depends on — identical results to plain jit, artifacts
round-trip across "processes" (fresh wrapper instances), statics/shapes keyed
separately, stale-code invalidation, and the tracing skip that is the whole
point (the second process must NOT re-run the traced Python body)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from streamspeech_tpu.runtime import aot


@pytest.fixture()
def aot_on(tmp_path, monkeypatch):
    monkeypatch.setenv("STREAMSPEECH_AOT_CACHE_DIR", str(tmp_path))
    monkeypatch.delenv("STREAMSPEECH_NO_AOT_CACHE", raising=False)
    monkeypatch.setattr(aot, "_FORCE_ENABLE", True)
    yield tmp_path


def make_fn(counter):
    def f(s, x, scale_pos, k):
        counter.append(1)  # trace-time side effect
        return s * k + x + scale_pos, jnp.sum(s * x)
    return f


def test_aot_matches_jit_and_skips_retrace(aot_on):
    traces1, traces2 = [], []
    f1 = aot.aot_jit(make_fn(traces1), static_argnames=("k",),
                     donate_argnums=())
    s = jnp.asarray(np.random.RandomState(0).randn(8, 16), jnp.float32)
    x = jnp.asarray(np.random.RandomState(1).randn(8, 16), jnp.float32)
    ref = jax.jit(make_fn([]), static_argnames=("k",))(s, x, 2.0, k=3)
    got = f1(s, x, 2.0, k=3)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert len(traces1) >= 1  # first process traced
    arts = list(aot_on.glob("*.jaxexport"))
    assert len(arts) == 1

    # "new process": a fresh wrapper over the same source fn loads the
    # artifact and never runs the Python body
    f2 = aot.aot_jit(make_fn(traces2), static_argnames=("k",),
                     donate_argnums=())
    got2 = f2(s, x, 2.0, k=3)
    for a, b in zip(got2, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert traces2 == [], "second process re-traced — AOT cache missed"


def test_aot_variants_keyed_by_static_and_shape(aot_on):
    f = aot.aot_jit(make_fn([]), static_argnames=("k",), donate_argnums=())
    s = jnp.ones((4, 4))
    x = jnp.ones((4, 4))
    a = f(s, x, 1.0, k=2)
    b = f(s, x, 1.0, k=5)                      # static change → new artifact
    c = f(jnp.ones((2, 4)), jnp.ones((2, 4)), 1.0, k=2)  # shape change
    assert float(a[0][0, 0]) == 4.0 and float(b[0][0, 0]) == 7.0
    assert c[0].shape == (2, 4)
    assert len(list(aot_on.glob("*.jaxexport"))) == 3


def test_aot_stale_code_invalidation(aot_on, monkeypatch):
    f = aot.aot_jit(make_fn([]), static_argnames=("k",), donate_argnums=())
    f(jnp.ones((4, 4)), jnp.ones((4, 4)), 1.0, k=2)
    n0 = len(list(aot_on.glob("*.jaxexport")))
    monkeypatch.setattr(aot, "_CODE_HASH", "deadbeef00000000")
    traces = []
    f2 = aot.aot_jit(make_fn(traces), static_argnames=("k",),
                     donate_argnums=())
    f2(jnp.ones((4, 4)), jnp.ones((4, 4)), 1.0, k=2)
    assert len(traces) >= 1                      # re-traced under new version
    assert len(list(aot_on.glob("*.jaxexport"))) == n0 + 1


def test_aot_none_and_scalar_args(aot_on):
    def g(x, opt, n):
        return x * n if opt is None else x * n + opt

    f = aot.aot_jit(g, static_argnames=(), donate_argnums=())
    x = jnp.ones((4,))
    np.testing.assert_allclose(np.asarray(f(x, None, 3)), 3.0)
    np.testing.assert_allclose(np.asarray(f(x, jnp.ones((4,)), 3)), 4.0)
    # None vs array opt are distinct variants
    assert len(list(aot_on.glob("*.jaxexport"))) == 2


def test_aot_donation_preserved_tpu(aot_on):
    if jax.default_backend() != "tpu":
        pytest.skip("buffer donation is a no-op on CPU")

    def g(s, x):
        return s + x

    f = aot.aot_jit(g, static_argnames=(), donate_argnums=(0,))
    s = jnp.ones((256, 256))
    out = f(s, jnp.ones((256, 256)))
    jax.block_until_ready(out)
    assert s.is_deleted(), "donated input still live through the AOT wrapper"


def test_aot_disabled_env_falls_back(aot_on, monkeypatch):
    monkeypatch.setenv("STREAMSPEECH_NO_AOT_CACHE", "1")
    f = aot.aot_jit(make_fn([]), static_argnames=("k",), donate_argnums=())
    f(jnp.ones((4, 4)), jnp.ones((4, 4)), 1.0, k=2)
    assert list(aot_on.glob("*.jaxexport")) == []


def test_aot_default_is_opt_in(aot_on, monkeypatch):
    # without STREAMSPEECH_AOT_CACHE=1 (and without the test force), aot_jit
    # must behave as plain jax.jit — measured slower than the persistent
    # compile cache through the tunnel, so it must never engage by default
    monkeypatch.setattr(aot, "_FORCE_ENABLE", False)
    monkeypatch.delenv("STREAMSPEECH_AOT_CACHE", raising=False)
    f = aot.aot_jit(make_fn([]), static_argnames=("k",), donate_argnums=())
    f(jnp.ones((4, 4)), jnp.ones((4, 4)), 1.0, k=2)
    assert list(aot_on.glob("*.jaxexport")) == []


def test_aot_clear_cache_drops_variants(aot_on):
    """engine.close() calls wrapper.clear_cache(): the loaded Exported.call
    closures and the underlying jit executables must be released (the r5
    close() regression kept every engine program alive because the wrapper
    had neither .lower nor .clear_cache)."""
    f = aot.aot_jit(make_fn([]), static_argnames=("k",), donate_argnums=())
    f(jnp.ones((4, 4)), jnp.ones((4, 4)), 1.0, k=2)
    variants = f.__closure__  # wrapper closes over the variants dict
    held = [c.cell_contents for c in variants
            if isinstance(c.cell_contents, dict)]
    assert held and any(d for d in held), "no variants recorded before clear"
    f.clear_cache()
    assert all(not d for d in held), "clear_cache left variants alive"
    # still callable afterwards (rebuilds from the on-disk artifact)
    out = f(jnp.ones((4, 4)), jnp.ones((4, 4)), 1.0, k=2)
    assert float(out[0][0, 0]) == 4.0


def test_compile_cache_dir_policy(monkeypatch, tmp_path):
    """_compile_cache_dir: env override wins; a writable git checkout gets a
    repo-local cache (homes are image-ephemeral in this deployment, the
    checkout volume persists); otherwise fall back to ~/.cache."""
    import streamspeech_tpu as pkg

    monkeypatch.setenv("STREAMSPEECH_COMPILE_CACHE_DIR", str(tmp_path / "o"))
    assert pkg._compile_cache_dir() == str(tmp_path / "o")

    monkeypatch.delenv("STREAMSPEECH_COMPILE_CACHE_DIR", raising=False)
    import os
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(pkg.__file__)))
    expected = (os.path.join(pkg_parent, ".xla_compile_cache")
                if os.path.isdir(os.path.join(pkg_parent, ".git"))
                and os.access(pkg_parent, os.W_OK)
                else os.path.join(os.path.expanduser("~"), ".cache",
                                  "streamspeech_tpu", "xla"))
    assert pkg._compile_cache_dir() == expected
