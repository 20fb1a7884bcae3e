"""Dispatch-overhead experiment: per-call loop vs scan-chained vs vmap-batched.

Determines how much of the per-frame bench time is per-dispatch overhead
(client + tunnel latency) vs true device compute, and whether batching
frames (vmap) fills the chip better than one-frame-at-a-time.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from lidar_processing_tpu.config import DEFAULT_CONFIG
from lidar_processing_tpu.io.dataset import list_frames, load_frame
from lidar_processing_tpu.runtime.pipeline import device_frame_step
from lidar_processing_tpu.types import pad_cloud


def checksum(fr):
    leaves = jax.tree_util.tree_leaves(fr)
    return sum(jnp.sum(jnp.asarray(l, jnp.float32).astype(jnp.float32))
               for l in leaves)


def main():
    cfg = DEFAULT_CONFIG
    cap = cfg.pipeline.max_points
    frames = list_frames()[:32]
    clouds = [pad_cloud(*load_frame(p), cap) for p in frames]
    xs = jnp.stack([jnp.asarray(c.xyz) for c in clouds])
    ms = jnp.stack([jnp.asarray(c.mask) for c in clouds])
    print("backend:", jax.default_backend(), "frames:", xs.shape[0],
          flush=True)

    step = jax.jit(lambda x, m: device_frame_step(x, m, cfg))
    out = step(xs[0], ms[0]); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(32):
        out = step(xs[i], ms[i])
    jax.block_until_ready(out)
    print(f"per-call loop      {(time.perf_counter()-t0)/32*1000:8.3f} "
          f"ms/frame", flush=True)

    @jax.jit
    def scan_all(xs, ms):
        def body(c, xm):
            fr = device_frame_step(xm[0], xm[1], cfg)
            return c + checksum(fr), None
        c, _ = jax.lax.scan(body, jnp.float32(0), (xs, ms))
        return c
    out = scan_all(xs, ms); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = scan_all(xs, ms)
    jax.block_until_ready(out)
    print(f"scan-chained (32)  {(time.perf_counter()-t0)/32*1000:8.3f} "
          f"ms/frame", flush=True)

    for b in (2, 4):
        @jax.jit
        def vmap_b(xs, ms):
            def body(c, xm):
                fr = jax.vmap(lambda x, m: device_frame_step(x, m, cfg))(
                    xm[0], xm[1])
                return c + checksum(fr), None
            c, _ = jax.lax.scan(
                body, jnp.float32(0),
                (xs.reshape(32 // b, b, *xs.shape[1:]),
                 ms.reshape(32 // b, b, *ms.shape[1:])))
            return c
        out = vmap_b(xs, ms); jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = vmap_b(xs, ms)
        jax.block_until_ready(out)
        print(f"scan+vmap b={b}      {(time.perf_counter()-t0)/32*1000:8.3f} "
              f"ms/frame", flush=True)


if __name__ == "__main__":
    main()
