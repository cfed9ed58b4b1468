#!/usr/bin/env python
"""Mosaic lowering experiments for the shifted-window primitive."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(tag, fn, *args):
    t0 = time.time()
    try:
        out = jax.jit(fn)(*args)
        out.block_until_ready()
        print(f"[{tag}] OK {time.time()-t0:.1f}s checksum={float(jnp.sum(out)):.3f}",
              flush=True)
        return np.asarray(out)
    except Exception as e:
        msg = str(e)
        for line in msg.splitlines():
            if ("rotate" in line or "legalize" in line or "implemented" in line
                    or "must" in line or "prove" in line):
                print(f"[{tag}] FAIL: {line.strip()[:160]}", flush=True)
                break
        else:
            print(f"[{tag}] FAIL: {msg[:160]}", flush=True)
        return None


# E1: 2-D roll on (1, 256)
def e1(x):
    def k(x_ref, o_ref):
        o_ref[:, :] = pltpu.roll(x_ref[:, :], jnp.int32(5), 1)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 256), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)


# E2: 2-D roll on (8, 128) along lanes
def e2(x):
    def k(x_ref, o_ref):
        o_ref[:, :] = pltpu.roll(x_ref[:, :], jnp.int32(5), 1)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)


# E3: sublane roll on (8, 128) along dim 0
def e3(x):
    def k(x_ref, o_ref):
        o_ref[:, :] = pltpu.roll(x_ref[:, :], jnp.int32(3), 0)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)


# E4: static python-int shift roll (maybe static shifts legalize)
def e4(x):
    def k(x_ref, o_ref):
        o_ref[:, :] = pltpu.roll(x_ref[:, :], 5, 1)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)


# E5: roll on larger 2-D (64, 512) lanes
def e5(x):
    def k(x_ref, o_ref):
        o_ref[:, :] = pltpu.roll(x_ref[:, :], 5, 1)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((64, 512), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)


print("devices:", jax.devices(), flush=True)
r = run("E1 (1,256) roll lanes dyn", e1, jnp.arange(256.0, dtype=jnp.float32).reshape(1, 256))
r = run("E2 (8,128) roll lanes dyn", e2, jnp.arange(1024.0, dtype=jnp.float32).reshape(8, 128))
r = run("E3 (8,128) roll sublanes dyn", e3, jnp.arange(1024.0, dtype=jnp.float32).reshape(8, 128))
r4 = run("E4 (8,128) roll lanes static", e4, jnp.arange(1024.0, dtype=jnp.float32).reshape(8, 128))
if r4 is not None:
    ref = np.roll(np.arange(1024.0, dtype=np.float32).reshape(8, 128), 5, axis=1)
    print("E4 matches np.roll:", np.array_equal(r4, ref), flush=True)
run("E5 (64,512) roll lanes static", e5,
    jnp.arange(64.0 * 512).astype(jnp.float32).reshape(64, 512))
print("DONE", flush=True)
