#!/usr/bin/env python
"""Scenario-level tensor-parallelism evidence: run the full approach-5
(HyDia) membership scenario single-device and slot-TP-sharded over an
8-virtual-device CPU mesh, assert bit-exactness, and record the step
times to docs/results/tp_scenario.json.

On shared host cores the sharded wall-clock measures SPMD partitioning
overhead, not speedup (total compute is fixed); the artifact states so.
Real latency splitting needs real chips over ICI.

  python tools/tp_scenario.py --out docs/results/tp_scenario.json
"""

import argparse
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"  # override: the env pins axon (TPU)
import jax  # noqa: E402 — sitecustomize may have pre-imported jax
jax.config.update("jax_platforms", "cpu")  # with the axon backend registered
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/results/tp_scenario.json")
    ap.add_argument("--ring", type=int, default=512)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--nvec", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import numpy as np
    import jax
    from image_matching_tpu.ckks.params import (SchemeParams,
                                                compute_required_depth)
    from image_matching_tpu.ckks.context import CkksContext
    from image_matching_tpu.matching.config import MatchConfig
    from image_matching_tpu.matching.protocol import MatchingProtocol
    from image_matching_tpu.parallel.tensor import TPScenario, make_tp_mesh
    from image_matching_tpu.utils import io as dio

    cfg = MatchConfig(vector_dim=args.dim, chunk_len=max(16, args.dim // 4))
    depth = compute_required_depth(5, cfg.comp_depth, cfg.alpha_depth)
    params = SchemeParams.create(ring_dim=args.ring, mult_depth=depth,
                                 security="none")
    ctx = CkksContext(params, seed=3)
    query, db = dio.gen_dataset(args.nvec, args.dim, seed=3)
    proto = MatchingProtocol.setup(5, db, cfg, ctx=ctx)
    qcts = proto.encrypt_query(query)

    def timed(run, reps):
        out = run()
        jax.block_until_ready(out.data)
        t0 = time.time()
        for _ in range(reps):
            out = run()
            jax.block_until_ready(out.data)
        return (time.time() - t0) / reps, out

    t1, single = timed(lambda: proto.sender.run_membership(qcts), args.reps)
    assert proto.decrypt_membership(single) is True

    # clamp to what the backend actually exposes: if the device-count flag
    # landed after backend init (sitecustomize imported jax first), an
    # unconditional 8-device mesh would crash (advisor r4; cf. scaling.py)
    n_dev = min(8, len(jax.devices()))
    tp = TPScenario(proto.sender, make_tp_mesh(n_dev))
    t8, sharded = timed(lambda: tp.membership(qcts), args.reps)
    bit_exact = bool(
        np.array_equal(np.asarray(single.data), np.asarray(sharded.data)))
    assert proto.decrypt_membership(sharded) is True

    result = {
        "scenario": "approach-5 membership, full pipeline",
        "ring": args.ring, "dim": args.dim, "nvec": args.nvec,
        "single_device_s": round(t1, 4),
        "tp_devices": n_dev,
        "slot_tp_sharded_s": round(t8, 4),
        "bit_exact": bit_exact,
        "note": (
            "8 virtual CPU devices share the host cores, so the sharded "
            "time includes full compute plus SPMD overhead — it is a "
            "correctness + overhead artifact, not a speedup measurement "
            "(that needs real chips over ICI)."),
    }
    print(json.dumps(result, indent=1))
    assert bit_exact, "slot-TP scenario output diverged from single-device"
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
