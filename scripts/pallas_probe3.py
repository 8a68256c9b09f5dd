import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def probe(name, fn, expect=None):
    try:
        out = fn(); arr = np.asarray(out)
        ok = "" if expect is None else f" correct={np.array_equal(arr, expect)}"
        t0 = time.perf_counter()
        for _ in range(20):
            r = fn()
        np.asarray(r)
        dt = (time.perf_counter() - t0) / 20
        print(f"{name}: OK {arr.shape} {dt*1e6:.0f}us{ok}", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)

# (a) gather along sublanes (axis=0): table (S,128), idx (8,128)
S = 512
tab = np.arange(S * 128, dtype=np.int32).reshape(S, 128)
idx0 = (np.arange(8 * 128, dtype=np.int32).reshape(8, 128) * 37) % S
exp0 = tab[idx0, np.arange(128)[None, :]]
def ka(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)
probe("take_along axis0 (S,128)x(8,128)", lambda: pl.pallas_call(
    ka, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(jnp.asarray(tab), jnp.asarray(idx0)), exp0)

# (b) axis=1 with idx (8,128), table (8,128)
tab1 = np.arange(8 * 128, dtype=np.int32).reshape(8, 128)
idx1 = (np.arange(8 * 128, dtype=np.int32).reshape(8, 128) * 13) % 128
exp1 = np.take_along_axis(tab1, idx1, axis=1)
def kb(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)
probe("take_along axis1 (8,128)x(8,128)", lambda: pl.pallas_call(
    kb, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(jnp.asarray(tab1), jnp.asarray(idx1)), exp1)

# (c) axis1 with wider table (8, 2048)
tab2 = np.arange(8 * 2048, dtype=np.int32).reshape(8, 2048)
idx2 = (np.arange(8 * 2048, dtype=np.int32).reshape(8, 2048) * 13) % 2048
exp2 = np.take_along_axis(tab2, idx2, axis=1)
probe("take_along axis1 (8,2048)", lambda: pl.pallas_call(
    kb, out_shape=jax.ShapeDtypeStruct((8, 2048), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(jnp.asarray(tab2), jnp.asarray(idx2)), exp2)

# (d) big sublane gather: table (S, 128) with S=16384, chained
S2 = 16384
tabB = np.arange(S2 * 128, dtype=np.int32).reshape(S2, 128) % S2
def kc(t_ref, i_ref, o_ref):
    def body(j, s):
        return jnp.take_along_axis(t_ref[:], s, axis=0) % S2
    o_ref[:] = jax.lax.fori_loop(0, 150, body, i_ref[:])
idxB = (np.arange(8 * 128, dtype=np.int32).reshape(8, 128) * 37) % S2
probe("chain150 axis0 (16384,128)", lambda: pl.pallas_call(
    kc, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(jnp.asarray(tabB), jnp.asarray(idxB)))
