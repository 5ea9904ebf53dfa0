"""Balanced token→expert assignment (BASE layers).

Native auction-algorithm kernel (native/balanced_assignment.cpp — the
fairseq.libbase equivalent) bound via ctypes for host-side routing, plus a
jittable on-device Sinkhorn router for SPMD training (the SURVEY §2.7 plan:
"implement balanced assignment in JAX ... on-device").
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
import jax
import jax.numpy as jnp
import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB = None
_FAILED = False


def _load():
    global _LIB, _FAILED
    if _LIB is not None or _FAILED:
        return _LIB
    so = _NATIVE_DIR / "libbalanced.so"
    src = _NATIVE_DIR / "balanced_assignment.cpp"
    try:
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", str(so),
                            str(src)], check=True, capture_output=True)
        lib = ctypes.CDLL(str(so))
        lib.balanced_assignment.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        _LIB = lib
    except Exception:
        _FAILED = True
    return _LIB


def balanced_assignment(scores: np.ndarray) -> np.ndarray:
    """scores [num_tokens, num_experts] (num_experts | num_tokens) → expert id
    per token with exactly num_tokens/num_experts tokens per expert."""
    scores = np.ascontiguousarray(scores, dtype=np.float32)
    t, e = scores.shape
    assert t % e == 0, "num_tokens must be divisible by num_experts"
    lib = _load()
    out = np.zeros(t, dtype=np.int64)
    if lib is not None:
        lib.balanced_assignment(
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), t, e,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return out
    # greedy fallback: sort all (token, expert) pairs by score
    cap = t // e
    counts = np.zeros(e, dtype=np.int64)
    taken = np.zeros(t, dtype=bool)
    order = np.argsort(-scores, axis=None)
    for flat in order:
        tok, ex = divmod(int(flat), e)
        if not taken[tok] and counts[ex] < cap:
            out[tok] = ex
            taken[tok] = True
            counts[ex] += 1
    return out


def sinkhorn_routing(scores: jnp.ndarray, iterations: int = 8,
                     temperature: float = 1.0) -> jnp.ndarray:
    """Jittable balanced soft assignment [T, E] → doubly-stochastic-ish routing
    matrix with near-uniform expert load (Sinkhorn normalization), used for
    on-device BASE-style routing under jit (hard argmax at dispatch)."""
    log_a = scores.astype(jnp.float32) / temperature

    def body(la, _):
        la = la - jax.scipy.special.logsumexp(la, axis=1, keepdims=True)
        la = la - jax.scipy.special.logsumexp(la, axis=0, keepdims=True)
        return la, None

    log_a, _ = jax.lax.scan(body, log_a, None, length=iterations)
    return jnp.exp(log_a)
