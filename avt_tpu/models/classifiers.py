"""Classifier heads.

Parity: reference conf/model/classifier/linear.yaml (torch.nn.Linear) and
models/classifiers.py (MLP: nlayers-1 x [Linear(in,in)+ReLU] then
Linear(in,out)).
"""
from __future__ import annotations

from flax import linen as nn


class LinearClassifier(nn.Module):
    out_features: int
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        # N(0, 0.01) like every reference nn.Linear (base_model.py:110-127)
        return nn.Dense(
            self.out_features, use_bias=self.bias,
            kernel_init=nn.initializers.normal(stddev=0.01), name="fc",
        )(x)


class MLPClassifier(nn.Module):
    out_features: int
    nlayers: int = 2
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        for i in range(self.nlayers - 1):
            x = nn.Dense(
                x.shape[-1], use_bias=self.bias,
                kernel_init=nn.initializers.normal(stddev=0.01),
                name=f"fc_{i}",
            )(x)
            x = nn.relu(x)
        return nn.Dense(
            self.out_features,
            kernel_init=nn.initializers.normal(stddev=0.01),
            name=f"fc_{self.nlayers - 1}",
        )(x)
