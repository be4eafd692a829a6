"""Measure host->device transfer bandwidth to the (tunneled) TPU.

The streamed 2^20 HyDia query must ship ~45+ GB of c0 limb data per pass;
this number decides whether h2d or compute bounds the north-star metric.
"""
import time

import jax
import numpy as np


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}")
    for mb in (64, 256, 873):
        arr = np.random.randint(0, 2**31, size=(mb * 1024 * 1024 // 4,),
                                dtype=np.uint32)
        # warmup
        x = jax.device_put(arr, dev)
        jax.block_until_ready(x)
        del x
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            x = jax.device_put(arr, dev)
            jax.block_until_ready(x)
            del x
        dt = (time.time() - t0) / reps
        print(f"h2d {mb:5d} MB: {dt:.3f}s = {mb / 1024 / dt:.2f} GB/s")


if __name__ == "__main__":
    main()
