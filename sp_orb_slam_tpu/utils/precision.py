"""Trace-time matmul-precision pinning for the float32 solver path.

On TPU the default matmul/conv precision truncates float32 operands to
bfloat16 (~8 mantissa bits).  That is the right trade for the learned
frontend (which opts into bf16 deliberately and passes explicit
``precision=HIGHEST`` on its fp32-parity paths), but it silently corrupts
the geometry/optimization stack: Hessian products ``J^T W J`` square
pixel-scale Jacobians (|J| ~ fx ~ 460) so a 4e-3 relative truncation error
lands directly in the normal equations that every LM step solves.  The
reference does all of this in g2o/Eigen *double* precision
(src/mapping/optimizer.cpp:231-443), so full-f32 is already a concession;
bf16 is measurably outside seed noise (round-2 NOTES: synthetic-rail ATE
0.17-0.21 CPU f32 vs 0.22-0.31 on the default TPU path).

``f32_matmul`` wraps a function so that *while it is being traced* the JAX
default matmul precision is "float32" (= HIGHEST on TPU: full-f32 via
multi-pass MXU).  Explicit ``precision=`` arguments inside still win, and
bf16-typed operands are unaffected, so wrapping a whole fused kernel is
safe.  Apply it *inside* ``jax.jit`` (jit outermost) so the context is
active at trace time; the config value participates in the jit cache key,
so there is no risk of a stale-cache mismatch.
"""

from __future__ import annotations

import functools

import jax


def f32_matmul(fn):
    """Decorator: trace ``fn`` under default matmul precision "float32"."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped


def jit_f32(fn=None, **jit_kwargs):
    """``jax.jit`` composed with :func:`f32_matmul` (jit outermost)."""
    if fn is None:
        return lambda f: jit_f32(f, **jit_kwargs)
    return jax.jit(f32_matmul(fn), **jit_kwargs)
