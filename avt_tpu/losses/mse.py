"""MSE variants.

Parity target: reference loss_fn/mse.py:7-17 (NormedMSE = L2-normalize both
args on the last dim, then elementwise MSE).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _reduce(loss: jax.Array, reduction: str) -> jax.Array:
    if reduction == "none":
        return loss
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    raise ValueError(f"Unknown reduction {reduction!r}")


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """torch.nn.functional.normalize(p=2) parity: x / max(||x||, eps)."""
    norm = jnp.linalg.norm(x, ord=2, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def mse(inp: jax.Array, tgt: jax.Array, reduction: str = "mean") -> jax.Array:
    return _reduce((inp.astype(jnp.float32) - tgt.astype(jnp.float32)) ** 2,
                   reduction)


def normed_mse(inp: jax.Array, tgt: jax.Array,
               reduction: str = "mean") -> jax.Array:
    """MSE after L2-normalizing both inputs along the feature dim."""
    return mse(l2_normalize(inp.astype(jnp.float32)),
               l2_normalize(tgt.astype(jnp.float32)), reduction)


class MSELoss:
    def __init__(self, reduction: str = "mean"):
        self.reduction = reduction

    def __call__(self, inp, tgt):
        return mse(inp, tgt, self.reduction)


class NormedMSE(MSELoss):
    def __call__(self, inp, tgt):
        return normed_mse(inp, tgt, self.reduction)
