"""Probe: semaphore_read on a DMA semaphore inside a native Mosaic kernel.

Questions: (1) does it lower? (2) what value does a completed local
async copy leave on the semaphore (bytes? 1?) before/after wait?
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("platform:", jax.devices()[0].platform, flush=True)


def kernel(x_ref, out, scr, sem):
    cp = pltpu.make_async_copy(x_ref, scr, sem)
    cp.start()
    # spin until the semaphore shows a nonzero value
    def cond(c):
        return c == 0

    def body(c):
        return pltpu.semaphore_read(sem)

    v_before = jax.lax.while_loop(cond, body, pltpu.semaphore_read(sem))
    cp.wait()
    v_after = pltpu.semaphore_read(sem)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    o = jnp.where((lane == 0) & (row == 0), v_before.astype(jnp.float32), 0.0)
    o = jnp.where((lane == 1) & (row == 0), v_after.astype(jnp.float32), o)
    out[:] = o + scr[:] * 0.0


x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
with jax.enable_x64(False):
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x)
o = np.asarray(out)
print("sem value before wait:", o[0, 0], "after wait:", o[0, 1], flush=True)
print("copy bytes:", 8 * 128 * 4, flush=True)
