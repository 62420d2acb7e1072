"""Experiment v3: two-head pairs with 128-lane-ALIGNED slices.

Hypothesis: the packed kernel's cost is misaligned (197,64) lane slices
(odd heads start mid-tile -> cross-lane shuffles per access). Loading
aligned (197,128) head-PAIRS and splitting heads via cheap masking keeps
every VMEM access tile-aligned at identical effective MXU work.
"""
import functools, math, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from avt_tpu.utils import enable_compile_cache

enable_compile_cache()

N, T, C, H = 160, 197, 768, 12
D = C // H
R = 30
LOG2E = 1.4426950408889634
rng = np.random.default_rng(0)
qkv0 = jnp.asarray(rng.normal(size=(N, T, 3 * C)).astype(np.float32) * 0.3,
                   dtype=jnp.bfloat16)


def _v3_kernel(qkv_ref, o_ref, *, num_heads, sm_scale):
    G, T_, C3 = qkv_ref.shape
    C_ = C3 // 3
    D_ = C_ // num_heads
    W = 2 * D_  # pair width = 128 lanes
    lane = jax.lax.broadcasted_iota(jnp.int32, (T_, W), 1)
    m_lo = (lane < D_).astype(qkv_ref.dtype)
    m_hi = (lane >= D_).astype(qkv_ref.dtype)
    for g in range(G):
        for hp in range(num_heads // 2):
            q2 = qkv_ref[g, :, hp * W:(hp + 1) * W] * (sm_scale * LOG2E)
            k2 = qkv_ref[g, :, C_ + hp * W:C_ + (hp + 1) * W]
            v2 = qkv_ref[g, :, 2 * C_ + hp * W:2 * C_ + (hp + 1) * W]
            # interleaved lo/hi chains: independent work lets Mosaic
            # overlap the VPU softmax of one head with MXU matmuls of the
            # other instead of serializing s -> softmax -> pv per head
            s_lo = jnp.dot(q2 * m_lo, k2.T, preferred_element_type=jnp.float32)
            s_hi = jnp.dot(q2 * m_hi, k2.T, preferred_element_type=jnp.float32)
            mx_lo = jnp.max(s_lo, axis=-1, keepdims=True)
            mx_hi = jnp.max(s_hi, axis=-1, keepdims=True)
            p_lo = jnp.exp2(s_lo - mx_lo)
            p_hi = jnp.exp2(s_hi - mx_hi)
            l_lo = jnp.maximum(jnp.sum(p_lo, axis=-1, keepdims=True), 1e-30)
            l_hi = jnp.maximum(jnp.sum(p_hi, axis=-1, keepdims=True), 1e-30)
            pn_lo = (p_lo * (1.0 / l_lo)).astype(v2.dtype)
            pn_hi = (p_hi * (1.0 / l_hi)).astype(v2.dtype)
            o = jnp.dot(pn_lo, v2 * m_lo, preferred_element_type=jnp.float32)
            o = o + jnp.dot(pn_hi, v2 * m_hi, preferred_element_type=jnp.float32)
            o_ref[g, :, hp * W:(hp + 1) * W] = o.astype(o_ref.dtype)


@jax.jit
def v3_fwd(qkv):
    sm_scale = 1.0 / math.sqrt(D)
    G = 4
    return pl.pallas_call(
        functools.partial(_v3_kernel, num_heads=H, sm_scale=sm_scale),
        grid=(N // G,),
        in_specs=[pl.BlockSpec((G, T, 3 * C), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, T, C), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, T, C), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * N * H * T * T * D,
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 4 // 3,
            transcendentals=N * H * T * T,
        ),
    )(qkv)


def timed(name, jfn, args):
    y = jfn(*args)
    _ = float(jnp.sum(jax.tree.leaves(y)[0].astype(jnp.float32)))
    t0 = time.time()
    y = jfn(*args)
    _ = float(jnp.sum(jax.tree.leaves(y)[0].astype(jnp.float32)))
    dt = (time.time() - t0) / R
    print(f"{name:34s} {dt*1000:8.3f} ms/iter", flush=True)


def pad3(o):
    return jnp.pad(o, ((0, 0), (0, 0), (0, 2 * C)))


@jax.jit
def loop(qkv):
    def body(x, _):
        return (x + pad3(v3_fwd(x)) * jnp.asarray(1e-6, x.dtype)
                ).astype(x.dtype), ()
    x, _ = jax.lax.scan(body, qkv, None, length=R)
    return x


timed("v3 pair-aligned fwd", loop, (qkv0,))

from avt_tpu.ops.attention import packed_attention

o_v3 = v3_fwd(qkv0)
o_ref = packed_attention(qkv0, H, use_pallas=True)
err = float(jnp.max(jnp.abs(o_v3.astype(jnp.float32) - o_ref.astype(jnp.float32))))
print(f"v3 vs packed max err: {err:.6f}")
