"""AOT program cache: on-disk jax.export artifacts so a cold serving process
skips Python TRACING of the big streaming programs.

Why: engine.warmup's cost on this host decomposes as tracing (~12 s per fused
policy program, GIL-serialized, pure Python) + lowering (~1.7 s) + compile
(1-4 min fresh through the remote helper, ~1-2 s as a persistent-compile-cache
hit). The persistent XLA cache (streamspeech_tpu.enable_persistent_compile_cache)
already removes the compile cost across processes; this module removes the
tracing cost the same way: the first process traces + exports + serializes the
StableHLO artifact, later processes `jax.export.deserialize` it (~ms) and jit a
thin wrapper around `exported.call` (the wrapper traces one opaque call — fast).

Donation: the wrapper re-applies the original donate_argnums (remapped to the
dynamic-only calling convention of `Exported.call`); a donated buffer is
invalidated exactly as with plain jit (asserted in tests/test_aot_cache.py).

Invalidation: the artifact key hashes the package SOURCE TREE + jax version +
static argument values + the dynamic arguments' avals, so any code change or
shape change re-exports. Directory override: STREAMSPEECH_AOT_CACHE_DIR.

OPT-IN (STREAMSPEECH_AOT_CACHE=1, TPU backends only): measured on this host
(scripts/measure_warmup.py --verbose, 2026-08-19), the export path LOSES to the persistent
XLA compile cache alone: population run 551 s (jax.export lowering goes
through the remote helper per program), steady-state cold-process warmup
49.3 s vs 38-66 s for plain jit + persistent compile cache. The artifact also
invalidates on ANY package source edit, re-paying the 551 s. Kept as an
opt-in because on a locally-attached chip (no per-RPC lowering cost) skipping
the 12 s/program GIL-serialized Python tracing is the remaining lever; tests
opt in via _FORCE_ENABLE.
"""

from __future__ import annotations

import functools
import hashlib
import inspect
import os
import threading
from pathlib import Path
from typing import Optional

_CODE_HASH: Optional[str] = None
_FORCE_ENABLE = False  # tests: allow the cache on CPU backends


def _code_version() -> str:
    """Hash of every .py in the package + the jax version: any source edit
    invalidates all artifacts (safe over clever)."""
    global _CODE_HASH
    if _CODE_HASH is None:
        import jax

        import streamspeech_tpu

        root = Path(streamspeech_tpu.__file__).parent
        h = hashlib.sha256(jax.__version__.encode())
        for p in sorted(root.rglob("*.py")):
            h.update(str(p.relative_to(root)).encode())
            h.update(p.read_bytes())
        _CODE_HASH = h.hexdigest()[:16]
    return _CODE_HASH


def _cache_dir() -> Path:
    return Path(os.environ.get(
        "STREAMSPEECH_AOT_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "streamspeech_tpu",
                     "aot")))


def _enabled() -> bool:
    if os.environ.get("STREAMSPEECH_NO_AOT_CACHE"):
        return False
    if _FORCE_ENABLE:
        return True
    if not os.environ.get("STREAMSPEECH_AOT_CACHE"):
        return False  # opt-in: measured slower than the persistent compile
        # cache through the remote tunnel (module docstring)
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _aval_sig(x) -> str:
    import jax
    import numpy as np

    if x is None:
        return "None"
    if isinstance(x, (bool, int, float, complex)):
        # weak-typed python scalar: type name is enough (shape ())
        return f"py{type(x).__name__}"
    leaves, treedef = jax.tree_util.tree_flatten(x)
    parts = [str(treedef)]
    for leaf in leaves:
        if isinstance(leaf, (bool, int, float, complex)):
            parts.append(f"py{type(leaf).__name__}")
        else:
            parts.append(f"{np.shape(leaf)}:{np.result_type(leaf)}")
    return "|".join(parts)


def aot_jit(fn=None, *, static_argnames=(), donate_argnums=()):
    """Drop-in replacement for
    ``jax.jit(fn, static_argnames=..., donate_argnums=...)`` on the engine's
    big programs. Off-cache behavior is identical to jax.jit; on a TPU
    backend each (shapes, statics) variant is served from a jax.export
    artifact when one exists on disk, else traced once and persisted."""
    if fn is None:
        return functools.partial(aot_jit, static_argnames=static_argnames,
                                 donate_argnums=donate_argnums)

    import jax

    jit_fn = jax.jit(fn, static_argnames=static_argnames,
                     donate_argnums=donate_argnums)
    sig = inspect.signature(fn)
    params = list(sig.parameters)
    static_set = set(static_argnames)
    dynamic_params = [p for p in params if p not in static_set]
    donated_names = [params[i] for i in donate_argnums]
    dyn_donate = tuple(dynamic_params.index(nm) for nm in donated_names)

    variants = {}
    lock = threading.Lock()

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if not _enabled():
            return jit_fn(*args, **kwargs)
        bound = sig.bind(*args, **kwargs)
        bound.apply_defaults()
        statics = {k: bound.arguments[k] for k in static_argnames
                   if k in bound.arguments}
        dyn = [bound.arguments[p] for p in dynamic_params
               if p in bound.arguments]
        key_src = "\x1e".join([
            fn.__name__, _code_version(), repr(sorted(statics.items())),
            *[_aval_sig(a) for a in dyn]])
        key = hashlib.sha256(key_src.encode()).hexdigest()[:32]

        with lock:
            call = variants.get(key)
        if call is None:
            call = _load_or_export(fn.__name__, key, jit_fn, bound, dyn,
                                   dyn_donate)
            with lock:
                variants[key] = call
        return call(*dyn)

    def clear_cache():
        """Drop every compiled variant this wrapper holds: the loaded/exported
        `Exported.call` closures AND the underlying jit executable cache —
        the engine.close() contract (runtime/session.py) requires a wrapped
        program to release its executables exactly like plain jax.jit."""
        with lock:
            variants.clear()
        cc = getattr(jit_fn, "clear_cache", None)
        if callable(cc):
            cc()

    wrapper._aot_jit_fn = jit_fn  # escape hatch / introspection
    wrapper.clear_cache = clear_cache
    return wrapper


def _load_or_export(name, key, jit_fn, bound, dyn, dyn_donate):
    import jax
    from jax import export as jexport

    d = _cache_dir()
    path = d / f"{name}-{key}.jaxexport"
    exported = None
    if path.exists():
        try:
            exported = jexport.deserialize(bytearray(path.read_bytes()))
        except Exception:
            exported = None  # stale/corrupt artifact: re-export below
    if exported is None:
        exported = jexport.export(jit_fn)(*bound.args, **bound.kwargs)
        try:
            d.mkdir(parents=True, exist_ok=True)
            tmp = path.with_suffix(f".tmp{os.getpid()}")
            tmp.write_bytes(exported.serialize())
            tmp.replace(path)
        except Exception:
            pass  # cache write is best-effort
    return jax.jit(exported.call, donate_argnums=dyn_donate)
