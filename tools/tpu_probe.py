#!/usr/bin/env python
"""Phase-by-phase timing probe of the TPU setup + enrollment + query path.

Run on the TPU host:  python tools/tpu_probe.py [log2n] [ring_dim]
"""

import os
import sys
import time
import faulthandler

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
faulthandler.dump_traceback_later(300, repeat=True, file=sys.stderr)

import jax  # noqa: E402
import numpy as np  # noqa: E402


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    ring = int(sys.argv[2]) if len(sys.argv) > 2 else 32768

    print("devices", jax.devices(), flush=True)
    from image_matching_tpu.ckks.params import SchemeParams, compute_required_depth
    from image_matching_tpu.ckks.context import CkksContext

    t0 = time.time()
    depth = compute_required_depth(5, 10, 2)
    params = SchemeParams.create(
        ring_dim=ring, mult_depth=depth,
        security="128c" if ring >= 32768 else "none",
    )
    print("params", round(time.time() - t0, 2), flush=True)

    t0 = time.time()
    ctx = CkksContext(params, seed=0)
    print("ctx (keygen+tables+transfers)", round(time.time() - t0, 2), flush=True)

    t0 = time.time()
    ctx.gen_power_of_two_rotation_keys()
    print("pow2 rotation keys", round(time.time() - t0, 2), flush=True)

    t0 = time.time()
    ctx.gen_rotation_keys(list(range(1, 32)) + [32 * j for j in range(1, 16)])
    print("bsgs rotation keys", round(time.time() - t0, 2), flush=True)

    z = np.random.default_rng(0).uniform(-1, 1, (64, ctx.slots))
    t0 = time.time()
    data = ctx.encrypt_batch(z)
    jax.block_until_ready(data)
    print("encrypt 64 cts (compile+run)", round(time.time() - t0, 2), flush=True)

    t0 = time.time()
    data = ctx.encrypt_batch(z)
    jax.block_until_ready(data)
    print("encrypt 64 cts (warm)", round(time.time() - t0, 2), flush=True)

    # one jitted mult+relin+rescale at production size
    from image_matching_tpu.ckks.context import Ciphertext

    def f(d1, d2):
        a = Ciphertext(d1, ctx.fresh_scale)
        b = Ciphertext(d2, ctx.fresh_scale)
        return ctx.rescale_score(ctx.relinearize(ctx.mul(a, b))).data

    jf = jax.jit(f)
    t0 = time.time()
    out = jf(data[0], data[1])
    jax.block_until_ready(out)
    print("mul+relin+rescale2 (compile+run)", round(time.time() - t0, 2), flush=True)
    t0 = time.time()
    for _ in range(10):
        out = jf(data[0], data[1])
    jax.block_until_ready(out)
    print("mul+relin+rescale2 warm x10", round(time.time() - t0, 3), flush=True)


if __name__ == "__main__":
    main()
