"""Loss functions (pure JAX, jit/grad/vmap friendly).

Mirrors the semantics of the reference's loss_fn/ package
(/root/reference/loss_fn/{multidim_xentropy,mse,simclr_infonce}.py) but as
stateless functions over arrays so they compose with jax transforms and
mesh collectives.
"""
from avt_tpu.losses.xent import (multidim_cross_entropy, MultiDimCrossEntropy,
    quantize_and_cross_entropy, QuantizeAndCrossEntropy)
from avt_tpu.losses.mse import normed_mse, mse, NormedMSE, MSELoss
from avt_tpu.losses.infonce import (
    mil_cross_entropy,
    simclr_infonce,
    SimclrInfoNCE,
    MultiDimSimclrInfoNCE,
)

__all__ = [
    "multidim_cross_entropy",
    "MultiDimCrossEntropy",
    "quantize_and_cross_entropy",
    "QuantizeAndCrossEntropy",
    "normed_mse",
    "mse",
    "NormedMSE",
    "MSELoss",
    "mil_cross_entropy",
    "simclr_infonce",
    "SimclrInfoNCE",
    "MultiDimSimclrInfoNCE",
]
