#!/usr/bin/env python
"""Scaling-efficiency artifact (software-overhead stand-in).

Real multi-chip ICI scaling cannot be measured in this environment (one
tunneled TPU chip); what CAN be measured is the overhead the SPMD
partitioning itself adds.  On an N-virtual-device CPU mesh
(--xla_force_host_platform_device_count), all N "devices" share the same
host cores, so total compute time is invariant in N for a FIXED total DB —
any slowdown of the sharded run vs the unsharded single-device run on the
same DB is pure partitioning/collective/dispatch overhead:

    efficiency(N) = t_unsharded(DB) / t_sharded(DB over N devices)

The >80% scaling-efficiency target (BASELINE.md:75) therefore has its
software half checked here; the ICI half needs real hardware.  Raw
weak-scaling times (DB grows with N) are also recorded for completeness but
are NOT efficiency evidence on shared cores — the artifact says so.

  python tools/scaling.py --out docs/results/weak_scaling.json
"""

import argparse
import json
import os
import sys
import time

# must precede any jax import
os.environ["JAX_PLATFORMS"] = "cpu"  # override: the env pins axon (TPU)
import jax  # noqa: E402 — sitecustomize may have pre-imported jax
jax.config.update("jax_platforms", "cpu")  # with the axon backend registered
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build(nvec, ring=512, dim=64, seed=3):
    from image_matching_tpu.ckks.params import (SchemeParams,
                                                compute_required_depth)
    from image_matching_tpu.ckks.context import CkksContext
    from image_matching_tpu.matching.config import MatchConfig
    from image_matching_tpu.matching.protocol import MatchingProtocol
    from image_matching_tpu.utils import io as dio

    cfg = MatchConfig(vector_dim=dim, chunk_len=max(16, dim // 4))
    depth = compute_required_depth(5, cfg.comp_depth, cfg.alpha_depth)
    params = SchemeParams.create(ring_dim=ring, mult_depth=depth,
                                 security="none")
    ctx = CkksContext(params, seed=seed)
    query, db = dio.gen_dataset(nvec, dim, seed=seed)
    proto = MatchingProtocol.setup(5, db, cfg, ctx=ctx)
    return proto, query


def timed_membership(run, reps=3):
    import jax
    out = run()
    jax.block_until_ready(out.data)  # compile + warmup
    t0 = time.time()
    for _ in range(reps):
        out = run()
        jax.block_until_ready(out.data)
    return (time.time() - t0) / reps, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/results/weak_scaling.json")
    ap.add_argument("--ring", type=int, default=512)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    from image_matching_tpu.parallel.sharded import make_mesh, ShardedScenario

    n_avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8) if n <= n_avail]
    ring, dim = args.ring, args.dim
    group = ring // 2  # vectors per DB group (= slots)

    result = {
        "mode": "spmd-overhead stand-in (virtual CPU mesh, shared cores)",
        "note": (
            "One tunneled TPU chip only: real ICI scaling is unmeasurable "
            "in this environment.  efficiency(N) = t_unsharded / "
            "t_sharded for the SAME total DB on an N-virtual-device CPU "
            "mesh isolates the SPMD partitioning + collective overhead "
            "(total compute is invariant on shared host cores).  "
            "weak_raw times (DB grows with N) are informational only."),
        "ring": ring, "dim": dim, "group_vectors": group,
        "overhead": [], "weak_raw": [],
    }

    # fixed total DB = 8 groups (or n_avail), the largest mesh's worth
    G = max(sizes)
    nvec = group * G
    proto, query = build(nvec, ring, dim)
    qcts = proto.encrypt_query(query)
    t_single, out = timed_membership(
        lambda: proto.sender.run_membership(qcts), args.reps)
    assert proto.decrypt_membership(out) is True
    result["unsharded_s"] = round(t_single, 4)
    print(f"unsharded  ({G} groups): {t_single:.3f}s", flush=True)

    for n in sizes:
        mesh = make_mesh(n)
        sharded = ShardedScenario(proto.sender, mesh)
        t_n, out = timed_membership(
            lambda: sharded.membership(qcts), args.reps)
        assert proto.decrypt_membership(out) is True
        eff = t_single / t_n
        result["overhead"].append(
            {"devices": n, "sharded_s": round(t_n, 4),
             "efficiency": round(eff, 3)})
        print(f"sharded N={n}: {t_n:.3f}s  software-efficiency {eff:.2f}",
              flush=True)

    # raw weak-scaling times (informational): per-device work constant
    for n in sizes:
        p, q = build(group * n, ring, dim)
        qc = p.encrypt_query(q)
        mesh = make_mesh(n)
        sharded = ShardedScenario(p.sender, mesh)
        t_n, out = timed_membership(
            lambda: sharded.membership(qc), args.reps)
        assert p.decrypt_membership(out) is True
        result["weak_raw"].append(
            {"devices": n, "total_vectors": group * n,
             "step_s": round(t_n, 4)})
        print(f"weak N={n} ({group * n} vecs): {t_n:.3f}s", flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
