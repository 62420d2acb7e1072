"""TPU compute kernels (Pallas) with portable JAX fallbacks."""
from avt_tpu.ops.attention import multi_head_attention, dot_product_attention

__all__ = ["multi_head_attention", "dot_product_attention"]
