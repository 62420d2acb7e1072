"""Frame-level ViT backbone (AVT-b).

Parity target: reference models/video_classification.py:213-257 — timm
vit_base_patch16_224 run per frame (time folded into batch), num_classes=0
so the per-frame feature is the class token after the final LayerNorm;
output reshaped to (B, C', T, 1, 1) so it flows like a video feature map.

TPU-first design choices:
  * frames batch into one (B*T, 196+1, 768) attention problem — a single
    big MXU-friendly matmul stream instead of a Python loop over frames;
  * attention runs through avt_tpu.ops.packed_attention: a Pallas kernel
    that reads the fused qkv projection in place (no split/transpose/pad
    copies) and whose backward emits one packed dqkv;
  * optional bfloat16 compute dtype (params stay f32) for MXU throughput.

Weight layout matches timm's names one-to-one through
avt_tpu.models.import_torch so released AVT/timm checkpoints load.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from avt_tpu.ops.attention import fused_qkv_attention

_VIT_LINEAR_INIT = nn.initializers.normal(stddev=0.01)


class _DenseParams(nn.Module):
    """Parameter holder with nn.Dense's exact tree (kernel, bias) so
    checkpoints import unchanged while the matmul runs inside a fused op."""

    features: int
    kernel_init: Any = _VIT_LINEAR_INIT

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", self.kernel_init, (in_features, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class ViTAttention(nn.Module):
    num_heads: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        N, T, C = x.shape
        # fused path: the qkv projection runs INSIDE the attention kernel
        # (per head-pair), overlapping projection MXU with softmax VPU; its
        # backward hands one packed dqkv to XLA's dx/dw matmuls — no
        # split/transpose/pad traffic in HBM (the round-1 bottleneck at
        # B*T=160 frames x 197 tokens). Param tree matches nn.Dense, so
        # timm/AVT checkpoint import is unchanged.
        # N(0, 0.01): the reference's model-wide Linear init clobbers
        # every ViT nn.Linear after construction (base_model.py:110-127)
        kernel, bias = _DenseParams(3 * C, name="qkv")(C)
        out = fused_qkv_attention(x, kernel, bias, self.num_heads)
        return nn.Dense(C, dtype=self.dtype,
                        kernel_init=_VIT_LINEAR_INIT, name="proj")(out)


class ViTBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-6
    drop_rate: float = 0.0
    dtype: Optional[jnp.dtype] = None
    # None = auto: exact erf GELU in f32 (bit-parity with timm), tanh
    # approximation under bf16 compute. Measured on v5e: the erf is VPU
    # transcendental work that costs ~0.9 ms/block at bench shapes while
    # the tanh form fuses into the matmul epilogue (~free), and in bf16
    # the approximation error is below the rounding error (mean abs err
    # 0.0020 vs 0.0017 against the f32-exact reference).
    gelu_approx: Optional[bool] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        approx = self.gelu_approx
        if approx is None:
            approx = self.dtype == jnp.bfloat16
        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm1")(x)
        x = x + nn.Dropout(self.drop_rate, deterministic=not train)(
            ViTAttention(self.num_heads, dtype=self.dtype, name="attn")(h)
        )
        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(x.shape[-1] * self.mlp_ratio), dtype=self.dtype,
                     kernel_init=_VIT_LINEAR_INIT, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=approx)  # timm uses exact GELU
        h = nn.Dense(x.shape[-1], dtype=self.dtype,
                     kernel_init=_VIT_LINEAR_INIT, name="mlp_fc2")(h)
        h = nn.Dropout(self.drop_rate, deterministic=not train)(h)
        return x + h


class ViT(nn.Module):
    """Frame-level ViT: (B, 3, T, H, W) -> (B, embed_dim, T, 1, 1)."""

    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    ln_eps: float = 1e-6
    dtype: Optional[jnp.dtype] = None  # e.g. jnp.bfloat16 compute
    gelu_approx: Optional[bool] = None  # see ViTBlock.gelu_approx

    @nn.compact
    def __call__(self, video, *, train: bool = False):
        B, C, T, H, W = video.shape
        n_patches = (H // self.patch_size) * (W // self.patch_size)
        # (B, 3, T, H, W) -> (B*T, H, W, 3): fold time into batch
        x = video.transpose(0, 2, 3, 4, 1).reshape(B * T, H, W, C)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        x = x.reshape(B * T, n_patches, self.embed_dim)
        # timm 0.4.12 init: trunc_normal(0.02) for cls_token/pos_embed
        # (they are bare Parameters the reference's Linear clobber skips)
        cls_token = self.param(
            "cls_token",
            nn.initializers.truncated_normal(stddev=0.02),
            (1, 1, self.embed_dim),
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (B * T, 1, self.embed_dim)).astype(x.dtype), x],
            axis=1,
        )
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(stddev=0.02),
            (1, n_patches + 1, self.embed_dim),
        )
        x = x + pos_embed.astype(x.dtype)
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        for i in range(self.depth):
            x = ViTBlock(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                ln_eps=self.ln_eps,
                drop_rate=self.drop_rate,
                dtype=self.dtype,
                gelu_approx=self.gelu_approx,
                name=f"blocks_{i}",
            )(x, train=train)
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm")(x)
        feat = x[:, 0].astype(jnp.float32)  # class token, back to f32
        # (B*T, C') -> (B, C', T, 1, 1)
        return feat.reshape(B, T, self.embed_dim).transpose(0, 2, 1)[..., None, None]

    output_dim = property(lambda self: self.embed_dim)
