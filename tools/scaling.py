#!/usr/bin/env python
"""Weak-scaling curve for the sharded membership pipeline on a virtual CPU
mesh (1..8 devices, one DB group per device).

This is the single-host stand-in for the >80% multi-chip scaling-efficiency
target (BASELINE.md): real ICI scaling needs a real slice, but the virtual
mesh measures what software can get wrong — collective overhead and
shard-imbalance — since compute here is bound by the 2 host cores either
way.  Reported metric: per-step time and group-throughput vs mesh size.

  python tools/scaling.py --out docs/results/weak_scaling.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/results/weak_scaling.json")
    ap.add_argument("--ring", type=int, default=512)
    ap.add_argument("--dim", type=int, default=64)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from image_matching_tpu.ckks.params import (SchemeParams,
                                                compute_required_depth)
    from image_matching_tpu.ckks.context import CkksContext
    from image_matching_tpu.matching.config import MatchConfig
    from image_matching_tpu.matching.protocol import MatchingProtocol
    from image_matching_tpu.parallel.sharded import make_mesh, ShardedScenario
    from image_matching_tpu.utils import io as dio

    cfg = MatchConfig(vector_dim=args.dim, chunk_len=16, comp_depth=8)
    depth = compute_required_depth(5, cfg.comp_depth, cfg.alpha_depth)
    params = SchemeParams.create(ring_dim=args.ring, mult_depth=depth,
                                 security="none")
    group = params.slots
    rows = []
    for n_dev in (1, 2, 4, 8):
        ctx = CkksContext(params, seed=11)
        query, db = dio.gen_dataset(group * n_dev, args.dim, seed=11)
        proto = MatchingProtocol.setup(5, db, cfg, ctx=ctx)
        qcts = proto.encrypt_query(query)
        sharded = ShardedScenario(proto.sender, make_mesh(n_dev))
        out = sharded.membership(qcts)          # compile + warm
        jax.block_until_ready(out.data)
        assert proto.decrypt_membership(out) is True
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            out = sharded.membership(qcts)
            jax.block_until_ready(out.data)
        dt = (time.time() - t0) / reps
        rows.append({"devices": n_dev, "groups": n_dev,
                     "step_s": round(dt, 4),
                     "groups_per_s": round(n_dev / dt, 3)})
        print(json.dumps(rows[-1]), flush=True)

    host_cores = os.cpu_count() or 1
    result = {"host_cores": host_cores, "note":
              "virtual CPU mesh: devices share the host cores, so ideal "
              "weak scaling flattens at n=cores; groups_per_s beyond that "
              "measures collective+dispatch overhead only", "rows": rows}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
