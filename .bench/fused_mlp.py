"""Experiment: fused MLP fwd (mm1 -> tanh-gelu -> mm2, h1 never in HBM).

Block over M rows; both weight mats resident in VMEM (9.4 MB bf16);
h1 chunked over N to bound VMEM. Compare vs XLA two-Dense MLP.
"""
import functools, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from avt_tpu.utils import enable_compile_cache

enable_compile_cache()

M, C, F = 160 * 197, 768, 3072  # 31520 rows; pad M to 32768 for blocking
MP = 32768
BM = 2048  # rows per program
R = 30
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32) * 0.5,
                 dtype=jnp.bfloat16)
w1 = jnp.asarray(rng.normal(size=(C, F)).astype(np.float32) * 0.02,
                 dtype=jnp.bfloat16)
b1 = jnp.asarray(rng.normal(size=(F,)).astype(np.float32) * 0.02,
                 dtype=jnp.bfloat16)
w2 = jnp.asarray(rng.normal(size=(F, C)).astype(np.float32) * 0.02,
                 dtype=jnp.bfloat16)
b2 = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.02,
                 dtype=jnp.bfloat16)


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[...]
    acc = None
    NCHUNK = 1024
    for j in range(F // NCHUNK):
        h = jnp.dot(x, w1_ref[:, j * NCHUNK:(j + 1) * NCHUNK],
                    preferred_element_type=jnp.float32)
        h = h + b1_ref[0, j * NCHUNK:(j + 1) * NCHUNK][None, :]
        h = jax.nn.gelu(h, approximate=True).astype(x.dtype)
        pv = jnp.dot(h, w2_ref[j * NCHUNK:(j + 1) * NCHUNK, :],
                     preferred_element_type=jnp.float32)
        acc = pv if acc is None else acc + pv
    o_ref[...] = (acc + b2_ref[0, :][None, :]).astype(o_ref.dtype)


@jax.jit
def fused_mlp(x, w1, b1, w2, b2):
    xp = jnp.pad(x, ((0, MP - M), (0, 0)))
    out = pl.pallas_call(
        _mlp_kernel,
        grid=(MP // BM,),
        in_specs=[
            pl.BlockSpec((BM, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((MP, C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * MP * C * F * 2,
            bytes_accessed=(MP * C * 2 + C * F + F * C) * 2,
            transcendentals=MP * F,
        ),
    )(xp, w1, b1[None, :], w2, b2[None, :])
    return out[:M]


@jax.jit
def xla_mlp(x, w1, b1, w2, b2):
    h = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1
    h = jax.nn.gelu(h, approximate=True).astype(x.dtype)
    return (jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2
            ).astype(x.dtype)


def chain(f):
    @jax.jit
    def loop(x):
        def body(x, _):
            return (x + f(x, w1, b1, w2, b2) * jnp.asarray(1e-3, x.dtype)
                    ).astype(x.dtype), ()
        x, _ = jax.lax.scan(body, x, None, length=R)
        return x
    return loop


def timed(name, jfn, args):
    y = jfn(*args)
    _ = float(jnp.sum(jax.tree.leaves(y)[0].astype(jnp.float32)))
    t0 = time.time()
    y = jfn(*args)
    _ = float(jnp.sum(jax.tree.leaves(y)[0].astype(jnp.float32)))
    dt = (time.time() - t0) / R
    print(f"{name:26s} {dt*1000:8.3f} ms/iter "
          f"{2*M*C*F*2/dt/1e12:6.0f} TF/s", flush=True)


timed("xla mlp fwd", chain(xla_mlp), (x0,))
timed("fused mlp fwd", chain(fused_mlp), (x0,))
a = fused_mlp(x0, w1, b1, w2, b2)
b = xla_mlp(x0, w1, b1, w2, b2)
print("max err:", float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))))
