#!/usr/bin/env python
"""GROTE (approach 2) cost breakdown on the TPU: times each jitted
segment of the cost-faithful membership/index pipeline separately so the
flat ~18.7 s at 2^12 (round-4 matrix) gets a named dominant term.

Segments (matching senders.GroteSender.run_membership/run_index):
  sim+cols   raw inner products + merge + dead colCipher (one segment)
  alpha      alpha_norm_rows + alpha_norm_columns (index path)
  compare    chebyshevCompare stack
  reduce     EvalAddMany + EvalSum

  python tools/probe_a2.py --log2n 12
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2n", type=int, default=12)
    ap.add_argument("--ring", type=int, default=32768)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from image_matching_tpu.utils.jaxcfg import enable_compilation_cache
    enable_compilation_cache()
    from image_matching_tpu.ckks.params import (SchemeParams,
                                                compute_required_depth)
    from image_matching_tpu.matching.config import MatchConfig
    from image_matching_tpu.matching.protocol import MatchingProtocol
    from image_matching_tpu.utils import io as dio

    cfg = MatchConfig(faithful_grote=True)
    depth = compute_required_depth(2, cfg.comp_depth, cfg.alpha_depth)
    params = SchemeParams.create(
        ring_dim=args.ring, mult_depth=depth,
        security="128c" if args.ring >= 32768 else "none")
    query, db = dio.gen_dataset(1 << args.log2n, cfg.vector_dim, seed=0)
    proto = MatchingProtocol.setup(2, db, cfg, params=params, seed=0)
    sender = proto.sender
    ctx = proto.ctx
    qcts = proto.encrypt_query(query)
    qstack = jnp.stack([c.data for c in qcts])

    import math
    batch = ctx.slots
    row_len = 2 ** math.ceil(math.log2(batch) / 2)
    res = {"log2n": args.log2n, "ring": args.ring, "segments_s": {}}

    def timed(name, fn):
        out = fn()
        jax.block_until_ready(jax.tree.leaves(out))
        t0 = time.time()
        for _ in range(args.reps):
            out = fn()
            jax.block_until_ready(jax.tree.leaves(out))
        dt = (time.time() - t0) / args.reps
        res["segments_s"][name] = round(dt, 4)
        print(f"{name}: {dt:.3f}s", flush=True)
        return out

    state = ctx.device_state()

    # membership pipeline, segment by segment (mirrors run_membership)
    def builder(meta):
        def fn(st, qs, dbd):
            old = sender.db.data
            sender.db.data = dbd
            try:
                with ctx.bound_state(st):
                    from image_matching_tpu.ckks.context import Ciphertext
                    cts = [Ciphertext(qs[i], ctx.fresh_scale)
                           for i in range(qs.shape[0])]
                    scores = sender.compute_similarity(cts)
                    cols = sender.alpha_norm_columns(scores, row_len)
                    meta["scale"] = scores[0].scale
                    return (jnp.stack([s.data for s in scores]),
                            jnp.stack([c.data for c in cols]))
            finally:
                sender.db.data = old
        return fn

    fn, meta = sender._seg(("grote_faithful_sim", qstack.shape), builder)
    sdata, _cols = timed("sim_merge_deadcols",
                         lambda: fn(state, qstack, sender.db.data))

    # similarity WITHOUT the dead colCipher, for the delta
    def builder2(meta):
        def fn2(st, qs, dbd):
            old = sender.db.data
            sender.db.data = dbd
            try:
                with ctx.bound_state(st):
                    from image_matching_tpu.ckks.context import Ciphertext
                    cts = [Ciphertext(qs[i], ctx.fresh_scale)
                           for i in range(qs.shape[0])]
                    scores = sender.compute_similarity(cts)
                    meta["scale"] = scores[0].scale
                    return jnp.stack([s.data for s in scores])
            finally:
                sender.db.data = old
        return fn2

    fn2, _ = sender._seg(("probe_sim_only", qstack.shape), builder2)
    timed("sim_merge_only", lambda: fn2(state, qstack, sender.db.data))

    fstack, fscale = None, None

    def cmp_run():
        nonlocal fstack, fscale
        fstack, fscale = sender._compare_segments(
            sdata, meta["scale"], cfg.match_threshold)
        return fstack

    timed("compare", cmp_run)
    timed("reduce", lambda: sender._reduce_segment(fstack, fscale)[0])

    # index alpha segment (rows + cols)
    fn3, meta3 = sender._seg(("grote_alpha", qstack.shape), None) \
        if ("grote_alpha", qstack.shape) in getattr(sender, "_segjits", {}) \
        else (None, None)
    if fn3 is None:
        def builder3(meta):
            def fn3(st, qs, dbd):
                old = sender.db.data
                sender.db.data = dbd
                try:
                    with ctx.bound_state(st):
                        from image_matching_tpu.ckks.context import Ciphertext
                        cts = [Ciphertext(qs[i], ctx.fresh_scale)
                               for i in range(qs.shape[0])]
                        scores = sender.compute_similarity(cts)
                        rows = sender.alpha_norm_rows(scores, row_len)
                        cols = sender.alpha_norm_columns(scores, row_len)
                        meta["r"] = rows[0].scale
                        meta["c"] = cols[0].scale
                        return (jnp.stack([r.data for r in rows]),
                                jnp.stack([c.data for c in cols]))
                finally:
                    sender.db.data = old
            return fn3
        fn3, meta3 = sender._seg(("grote_alpha", qstack.shape), builder3)
    timed("sim_alpha_rows_cols", lambda: fn3(state, qstack, sender.db.data))

    print(json.dumps(res))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
