"""BatchNorm with torch-exact running-statistics semantics.

flax's `nn.BatchNorm` folds the BIASED batch variance into the running
average; torch's `_BatchNorm` (torch/nn/modules/batchnorm.py) normalizes
with the biased variance but accumulates the UNBIASED one
(`var * n / (n - 1)`). The eval-time forward of a trained torch checkpoint
therefore depends on that n/(n-1) correction — without it every
train-then-eval comparison against the reference's BN backbones
(models/video_classification.py BN-Inception / video resnets) drifts by a
factor the spatial-element count sets, which at the small feature maps of
late stages is well above test tolerance.

Normalization order mirrors flax (`mul = rsqrt(var+eps) * scale` then
`(x - mean) * mul + bias`) so imported-checkpoint eval parity keeps the
exact rounding the round-1 tests pinned. Stats are computed in f32
regardless of the activation dtype (bf16 backbones), matching torch's
f32 running buffers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class TorchExactBatchNorm(nn.Module):
    """Drop-in for `nn.BatchNorm(use_running_average=not train)` with
    torch's unbiased running-variance accumulation.

    Parameter/stat layout matches flax BatchNorm exactly (params:
    scale/bias; batch_stats: mean/var), so checkpoint importers and
    existing param trees are unaffected.
    """

    use_running_average: bool = False
    momentum: float = 0.9  # flax convention: running = m*running + (1-m)*new
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32))

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axes)
            # biased batch variance normalizes the activations...
            var = jnp.mean(jnp.square(xf - mean), axes)
            if not self.is_initializing():
                # ...but torch accumulates the UNBIASED one into running_var
                n = x.size // feat
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * unbiased

        mul = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean) * mul + bias
        return y.astype(x.dtype)
