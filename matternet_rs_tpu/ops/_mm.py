"""Matmul helpers with explicit precision control.

On TPU, f32 ``jnp.dot`` defaults to bf16 MXU passes; on AMX CPUs the same
happens. Graph topology (top-k over distances) and λ parity are sensitive to
this, so parity-critical matmuls go through :func:`mm` (HIGHEST precision —
f32 accumulate). Throughput-critical scans that tolerate bf16 can use
:func:`mm_fast` explicitly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mm(a: jax.Array, b: jax.Array) -> jax.Array:
    """Precision-safe matmul (f32 accumulation everywhere)."""
    return jnp.dot(
        a, b,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def mm_fast(a: jax.Array, b: jax.Array) -> jax.Array:
    """Default-precision matmul — full MXU speed, bf16 multiplicands on TPU."""
    return jnp.dot(a, b, preferred_element_type=jnp.float32)
