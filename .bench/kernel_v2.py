"""Experiment: head-parallel packed attention fwd — grid (rows, heads),
BlockSpecs DMA each head's q/k/v lane-slice directly; zero in-kernel
lane slicing. Compare against the current packed kernel."""
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
NEG_INF = -1e30
LOG2E = 1.4426950408889634
rng = np.random.default_rng(0)
qkv0 = jnp.asarray(rng.normal(size=(N, T, 3 * C)).astype(np.float32) * 0.3,
                   dtype=jnp.bfloat16)


def _v2_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale):
    G = q_ref.shape[0]
    for g in range(G):
        q = q_ref[g, :, :] * (sm_scale * LOG2E)
        s = jnp.dot(q, k_ref[g, :, :].T, preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
        pn = (p * (1.0 / l)).astype(v_ref.dtype)
        o_ref[g, :, :] = jnp.dot(
            pn, v_ref[g, :, :], preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("G",))
def v2_fwd(qkv, G=32):
    sm_scale = 1.0 / math.sqrt(D)
    blk = lambda idx: pl.BlockSpec((G, T, D), idx, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_v2_kernel, sm_scale=sm_scale),
        grid=(N // G, H),
        in_specs=[
            blk(lambda n, h: (n, 0, h)),
            blk(lambda n, h: (n, 0, H + h)),
            blk(lambda n, h: (n, 0, 2 * H + h)),
        ],
        out_specs=blk(lambda n, h: (n, 0, h)),
        out_shape=jax.ShapeDtypeStruct((N, T, C), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * N * H * T * T * D,
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 4 // 3,
            transcendentals=N * H * T * T,
        ),
    )(qkv, qkv, qkv)


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


for G in (8, 16, 32):
    @jax.jit
    def loop(qkv, _G=G):
        def body(x, _):
            return (x + pad3(v2_fwd(x, G=_G)) * jnp.asarray(1e-6, x.dtype)
                    ).astype(x.dtype), ()
        x, _ = jax.lax.scan(body, qkv, None, length=R)
        return x
    timed(f"v2 head-parallel fwd G={G}", loop, (qkv0,))

# correctness vs current packed kernel
from avt_tpu.ops.attention import packed_attention

o_v2 = v2_fwd(qkv0)
o_ref = packed_attention(qkv0, H, use_pallas=True)
err = float(jnp.max(jnp.abs(o_v2.astype(jnp.float32) - o_ref.astype(jnp.float32))))
print(f"v2 vs packed max err: {err:.6f}")
