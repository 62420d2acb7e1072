"""Does Mosaic overlap independent MXU and VPU work inside one kernel?

Kernel A: matmul chain only. Kernel B: VPU chain only (exp2 passes).
Kernel C: both, independent. If C ~= max(A, B): overlap. If C ~= A+B:
serialized -> a fused qkv+attention kernel would NOT hide softmax time.
"""
import functools, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from avt_tpu.utils import enable_compile_cache

enable_compile_cache()

M, K, N = 768, 768, 768   # matmul work per program
T = 200                    # VPU tile rows (8-aligned)
TL = 256                   # VPU tile lanes (128-aligned)
REPS = 6                   # chains per program
G = 20                     # grid size
R = 30

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(size=(G * M, K)).astype(np.float32) * 0.1,
                 dtype=jnp.bfloat16)
w0 = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.1,
                 dtype=jnp.bfloat16)
s0 = jnp.asarray(rng.normal(size=(G * T, TL)).astype(np.float32))


def k_mxu(x_ref, w_ref, o_ref):
    acc = None
    for i in range(REPS):
        y = jnp.dot(x_ref[...], w_ref[...], preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y * (0.5 ** i)
    o_ref[...] = acc.astype(o_ref.dtype)


def k_vpu(s_ref, o_ref):
    s = s_ref[...]
    for i in range(REPS):
        s = jnp.exp2(s * 0.25 - 1.0) + s * 0.5
    o_ref[...] = s


def k_both(x_ref, w_ref, s_ref, o_ref, so_ref):
    # fully independent chains, interleaved per rep
    acc = None
    s = s_ref[...]
    for i in range(REPS):
        y = jnp.dot(x_ref[...], w_ref[...], preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y * (0.5 ** i)
        s = jnp.exp2(s * 0.25 - 1.0) + s * 0.5
    o_ref[...] = acc.astype(o_ref.dtype)
    so_ref[...] = s


blk = lambda shape, idx: pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)


@jax.jit
def run_mxu(x, w):
    return pl.pallas_call(
        k_mxu, grid=(G,),
        in_specs=[blk((M, K), lambda i: (i, 0)), blk((K, N), lambda i: (0, 0))],
        out_specs=blk((M, N), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((G * M, N), x.dtype),
    )(x, w)


@jax.jit
def run_vpu(s):
    return pl.pallas_call(
        k_vpu, grid=(G,),
        in_specs=[blk((T, TL), lambda i: (i, 0))],
        out_specs=blk((T, TL), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((G * T, TL), s.dtype),
    )(s)


@jax.jit
def run_both(x, w, s):
    return pl.pallas_call(
        k_both, grid=(G,),
        in_specs=[blk((M, K), lambda i: (i, 0)), blk((K, N), lambda i: (0, 0)),
                  blk((T, TL), lambda i: (i, 0))],
        out_specs=[blk((M, N), lambda i: (i, 0)), blk((T, TL), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((G * M, N), x.dtype),
                   jax.ShapeDtypeStruct((G * T, TL), s.dtype)],
    )(x, w, s)


def timed(name, jfn, args):
    y = jfn(*args)
    _ = float(jnp.sum(jax.tree.leaves(y)[0].astype(jnp.float32)))
    t0 = time.time()
    for _i in range(R):
        y = jfn(*args)
    _ = float(jnp.sum(jax.tree.leaves(y)[0].astype(jnp.float32)))
    dt = (time.time() - t0) / R * 1000
    print(f"{name:14s} {dt:7.3f} ms")
    return dt


a = timed("mxu only", run_mxu, (x0, w0))
b = timed("vpu only", run_vpu, (s0,))
c = timed("both", run_both, (x0, w0, s0))
print(f"sum={a+b:.3f}  max={max(a,b):.3f}  both={c:.3f}  "
      f"-> {'OVERLAPPED' if c < a + 0.6*b else 'SERIALIZED'}")
