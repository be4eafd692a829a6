#!/usr/bin/env python
"""Benchmark: HyDia (approach 5) encrypted membership query on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: reference server membership computation time at the same DB size
on a 48-core Xeon (BASELINE.md, tools/figures/approach5.csv).

Robustness: the driver runs this under a hard timeout.  We therefore
(a) keep a best-so-far result in memory from the first (warmup) run on,
(b) install SIGTERM/SIGINT/SIGALRM handlers that print the best-so-far
    JSON and exit 0, and
(c) enforce an internal deadline (IMTPU_BENCH_DEADLINE_S, default 1350 s)
    that fires before any plausible driver budget, so a slow compile or a
    wedged TPU session can never yield zero captured data again
    (round-2 failure mode: rc=124, parsed null).

Env knobs:
  BENCH_LOG2N     log2 of DB size (default 20 — the north-star size)
  BENCH_RING      ring dimension (default 32768)
  BENCH_SCENARIO  membership (default) | index
  BENCH_STREAM    1 = host-streamed seed-compressed DB (default at >= 2^16)
  IMTPU_BENCH_DEADLINE_S  internal wall-clock budget (default 1350)
"""

import json
import os
import signal
import sys
import time

import numpy as np

# Wall-clock origin survives watchdog re-execs (IMTPU_BENCH_T0), so the
# internal SIGALRM deadline is measured from the FIRST attempt and always
# fires before the driver's budget even across 5 re-exec attempts.
_T0 = float(os.environ.get("IMTPU_BENCH_T0") or time.time())
os.environ.setdefault("IMTPU_BENCH_T0", repr(_T0))

# Reference seconds by (approach, log2n) — BASELINE.md table
# (tools/figures/approach{1..5}.csv: membership / identification).
APPROACH_NAMES = {1: "baseline", 2: "grote", 3: "blind", 4: "hers",
                  5: "hydia"}
REF = {
    (1, 10): (11.53, 11.35), (1, 11): (17.10, 16.84),
    (1, 12): (35.86, 35.58), (1, 13): (64.59, 64.22),
    (1, 14): (133.76, 135.78), (1, 15): (264.69, 265.53),
    (2, 10): (17.45, 20.64), (2, 11): (25.18, 28.30),
    (2, 12): (48.68, 50.74), (2, 13): (89.65, 92.06),
    (2, 14): (175.18, 176.00), (2, 15): (338.36, 336.71),
    (3, 10): (8.50, 8.14), (3, 11): (12.97, 12.80),
    (3, 12): (22.00, 21.04), (3, 13): (40.08, 39.51),
    (3, 14): (79.66, 79.95), (3, 15): (161.15, 161.19),
    (4, 10): (4.28, 3.46), (4, 11): (4.17, 3.49), (4, 12): (4.13, 3.46),
    (4, 13): (4.17, 3.28), (4, 14): (4.17, 3.47), (4, 15): (6.21, 5.37),
    (4, 16): (9.84, 9.11), (4, 17): (16.99, 15.84),
    (4, 18): (30.97, 28.77), (4, 19): (58.15, 54.03),
    (4, 20): (115.54, 110.91),
    (5, 10): (5.89, 4.68), (5, 11): (4.46, 4.19), (5, 12): (4.54, 4.20),
    (5, 13): (4.49, 4.35), (5, 14): (4.52, 4.18), (5, 15): (6.16, 5.85),
    (5, 16): (9.56, 9.01), (5, 17): (16.01, 15.47),
    (5, 18): (28.73, 27.63), (5, 19): (53.25, 49.70),
    (5, 20): (102.41, 96.52),
}

_BEST = {}  # best-so-far result; printed exactly once at exit


def _deadline_s() -> float:
    return float(os.environ.get("IMTPU_BENCH_DEADLINE_S", "1350"))


def _remaining() -> float:
    return _deadline_s() - (time.time() - _T0)


def _emit_and_exit(code: int = 0):
    """Print the single JSON result line (best-so-far) and exit."""
    if _BEST:
        print(json.dumps(_BEST), flush=True)
    else:
        print(json.dumps({"metric": "bench_no_result", "value": 0,
                          "unit": "", "vs_baseline": 0}), flush=True)
    os._exit(code)


def _install_guards():
    def handler(signum, frame):
        print(f"# bench: signal {signum} at t={time.time()-_T0:.1f}s; "
              f"emitting best-so-far", file=sys.stderr, flush=True)
        _emit_and_exit(0)

    for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGALRM):
        signal.signal(sig, handler)
    # SIGALRM fires at the internal deadline even if we are blocked inside
    # a jax compile/execute call (those release the GIL).
    signal.setitimer(signal.ITIMER_REAL, max(1.0, _deadline_s()))


def bench_ctmult():
    """Secondary metric: relinearized ct-ct mult ops/s on one chip."""
    import time as _t

    import jax
    from image_matching_tpu.utils.jaxcfg import enable_compilation_cache
    enable_compilation_cache()
    from image_matching_tpu.ckks.params import SchemeParams
    from image_matching_tpu.ckks.context import CkksContext, Ciphertext

    ring = int(os.environ.get("BENCH_RING", "32768"))
    params = SchemeParams.create(ring_dim=ring, mult_depth=11,
                                 security="128c" if ring >= 32768 else "none")
    ctx = CkksContext(params, seed=0)
    z = np.random.default_rng(0).uniform(-1, 1, (2, ctx.slots))
    data = ctx.encrypt_batch(z)

    def f(d1, d2):
        a = Ciphertext(d1, ctx.fresh_scale)
        b = Ciphertext(d2, ctx.fresh_scale)
        return ctx.rescale_score(ctx.relinearize(ctx.mul(a, b))).data

    import jax
    jf = jax.jit(f)
    out = jf(data[0], data[1])
    jax.block_until_ready(out)
    reps = 50
    t0 = _t.time()
    for _ in range(reps):
        out = jf(data[0], data[1])
    jax.block_until_ready(out)
    per = (_t.time() - t0) / reps
    _BEST.update({
        "metric": "ct_mult_relin_rescale_ops_per_s",
        "value": round(1.0 / per, 1),
        "unit": "ops/s/chip",
        "vs_baseline": 0.0,
    })
    _emit_and_exit(0)


def _device_warmup_or_reexec(timeout_s: float = 180.0):
    """The remote TPU session occasionally wedges at claim time (a grant
    lost by a previous client).  Probe the device with a watchdog; if the
    first op never completes, re-exec this process for a fresh client."""
    import threading

    import jax
    import jax.numpy as jnp

    ok = []

    def warm():
        jax.block_until_ready(jnp.ones((8, 128), jnp.uint32) * 2)
        ok.append(1)

    t = threading.Thread(target=warm, daemon=True)
    t.start()
    t.join(timeout_s)
    if ok:
        return
    _reexec("TPU session wedged at claim")


def _reexec(why: str, abort_check=None):
    attempt = int(os.environ.get("IMTPU_BENCH_ATTEMPT", "0"))
    if attempt >= 5:
        _BEST.setdefault("metric", "error_tpu_session_wedged")
        _BEST.setdefault("value", 0)
        _BEST.setdefault("unit", "")
        _BEST.setdefault("vs_baseline", 0)
        _emit_and_exit(3)
    print(f"# {why}; re-exec attempt {attempt + 1}", file=sys.stderr,
          flush=True)
    # let the terminal fully drain the dying client's buffers — claiming
    # too early yields a session that wedges again under heavy DMA
    time.sleep(150)
    # the stall may have resolved during the drain sleep (enrollment
    # resumed, or a result was recorded): re-exec would discard that
    if _BEST or (abort_check is not None and abort_check()):
        print("# re-exec aborted: progress resumed / result recorded "
              "during drain sleep", file=sys.stderr, flush=True)
        return
    # counted only when the re-exec actually happens, so an aborted
    # (progress-resumed) stall never consumes one of the 5 attempts
    os.environ["IMTPU_BENCH_ATTEMPT"] = str(attempt + 1)
    os.execv(sys.executable, [sys.executable] + sys.argv)


def _start_stall_watchdog(stall_s: float = None) -> dict:
    """Re-exec if streamed enrollment stops making per-group progress (a
    mid-transfer tunnel wedge never completes; only a fresh client
    recovers).  Heartbeats come from streaming.LAST_PROGRESS.  Armed only
    while ctl["on"] is True — later phases (compiles) legitimately go
    minutes without a heartbeat, and once a result is recorded a re-exec
    (which forgets it) is worse than riding out the deadline."""
    import threading

    from image_matching_tpu.matching import streaming

    if stall_s is None:
        # overridable: under host contention (e.g. a test suite sharing the
        # 2 cores) the first group's cold seeded-encrypt compile alone can
        # exceed 300s and trip a spurious re-exec
        stall_s = float(os.environ.get("IMTPU_STALL_S", "300"))
    streaming.LAST_PROGRESS[0] = time.time()
    ctl = {"on": True}

    def watch():
        while True:
            time.sleep(15)
            hb = streaming.LAST_PROGRESS[0]
            if ctl["on"] and time.time() - hb > stall_s:
                _reexec(f"no streaming progress for {stall_s:.0f}s",
                        abort_check=lambda: (not ctl["on"])
                        or streaming.LAST_PROGRESS[0] > hb)

    threading.Thread(target=watch, daemon=True).start()
    return ctl


def main():
    _install_guards()
    if os.environ.get("BENCH_METRIC") == "ctmult":
        _device_warmup_or_reexec()
        bench_ctmult()
        return
    try:
        _run_scenario()
    except Exception as e:  # e.g. HBM OOM at the north-star size
        fallback = os.environ.get("BENCH_FALLBACK_LOG2N", "17,13")
        sizes = [s for s in fallback.split(",") if s]
        if not sizes or _remaining() < 240:
            print(f"# bench failed terminally ({type(e).__name__}: {e})",
                  file=sys.stderr)
            _emit_and_exit(0 if _BEST else 1)
        print(f"# bench failed ({type(e).__name__}: {e}); "
              f"falling back to 2^{sizes[0]}", file=sys.stderr)
        os.environ["BENCH_LOG2N"] = sizes[0]
        os.environ["BENCH_FALLBACK_LOG2N"] = ",".join(sizes[1:])
        os.execv(sys.executable, [sys.executable] + sys.argv)


def _run_scenario():
    log2n = int(os.environ.get("BENCH_LOG2N", "20"))
    ring = int(os.environ.get("BENCH_RING", "32768"))
    scenario = os.environ.get("BENCH_SCENARIO", "membership")
    approach = int(os.environ.get("BENCH_APPROACH", "5"))
    n = 1 << log2n
    # streamed (host-RAM seed-compressed DB) once the encrypted DB would
    # crowd HBM; overridable with BENCH_STREAM=0/1
    streamed = bool(int(os.environ.get("BENCH_STREAM", str(int(log2n >= 16)))))

    import jax
    from image_matching_tpu.utils.jaxcfg import enable_compilation_cache
    enable_compilation_cache()
    from image_matching_tpu.ckks.params import SchemeParams, compute_required_depth
    from image_matching_tpu.matching.config import MatchConfig
    from image_matching_tpu.matching.protocol import MatchingProtocol
    from image_matching_tpu.utils import io as dio

    cfg = MatchConfig()
    depth = compute_required_depth(approach, cfg.comp_depth, cfg.alpha_depth)
    params = SchemeParams.create(
        ring_dim=ring, mult_depth=depth,
        security="128c" if ring >= 32768 else "none",
    )
    _device_warmup_or_reexec()
    query, db = dio.gen_dataset(n, cfg.vector_dim, seed=0)

    t0 = time.time()
    wd = _start_stall_watchdog() if streamed else {"on": False}
    proto = MatchingProtocol.setup(approach, db, cfg, params=params, seed=0,
                                   streamed=streamed,
                                   **({"verbose": True} if streamed else {}))
    wd["on"] = False
    print(f"# setup+enroll: {time.time()-t0:.1f}s (streamed={streamed}, "
          f"deadline remaining {_remaining():.0f}s)", file=sys.stderr,
          flush=True)
    del db

    qcts = proto.encrypt_query(query)
    jax.block_until_ready([c.data for c in qcts])

    pair = REF.get((approach, log2n))
    ref = (pair[1] if scenario == "index" else pair[0]) if pair else None

    def run():
        if scenario == "index":
            out = proto.sender.run_index(qcts)
            jax.block_until_ready([c.data for c in out])
        else:
            out = proto.sender.run_membership(qcts)
            jax.block_until_ready(out.data)
        return out

    def record(elapsed, note, ok):
        """Keep-best policy: a correct run always beats an incorrect one;
        among runs of equal correctness, keep the fastest.  Correctness is
        a separate field (never folded into the metric name) so keep-best
        matching can't silently clear a wrong-result flag."""
        metric = (f"{APPROACH_NAMES[approach]}_{scenario}"
                  f"_2^{log2n}_server_compute")
        if _BEST.get("metric") == metric:
            cur_ok = bool(_BEST.get("correct", False))
            if (cur_ok and not ok) or (cur_ok == ok
                                       and _BEST["value"] <= elapsed):
                print(f"# run [{note}]: {elapsed:.2f}s ok={ok} (keeping "
                      f"best {_BEST['value']:.2f}s ok={cur_ok})",
                      file=sys.stderr, flush=True)
                return
        vs = (ref / elapsed) if (ref and ok) else 0.0
        _BEST.update({
            "metric": metric,
            "value": round(elapsed, 4),
            "unit": "seconds",
            "vs_baseline": round(vs, 2),
            "correct": bool(ok),
        })
        print(f"# best-so-far [{note}]: {elapsed:.2f}s ok={ok} "
              f"(vs_baseline {vs:.2f})", file=sys.stderr, flush=True)

    # compile + warmup run — already a valid (pessimistic) measurement:
    # it includes jit-cache loads and first-touch streaming
    t0 = time.time()
    out = run()
    first = time.time() - t0
    print(f"# compile+first run: {first:.1f}s", file=sys.stderr, flush=True)
    record(first, "warmup", _check(out, proto, scenario))

    # steady-state timed runs (up to 3, keep the best): transfer-path
    # hiccups on the tunneled TPU occasionally inflate a single pass, so
    # one steady run is not a reliable sample
    last = first
    for rep in range(3):
        if _remaining() < last * 1.2 + 30:
            print(f"# stopping steady-state reps: {_remaining():.0f}s left",
                  file=sys.stderr)
            break
        t0 = time.time()
        out = run()
        last = time.time() - t0
        record(last, f"steady-state {rep}", _check(out, proto, scenario))
    _emit_and_exit(0)


def _check(out, proto, scenario) -> bool:
    """Decrypt and validate the scenario output; returns ok (recorded as
    the run's `correct` field by record(), never by mutating the metric)."""
    import sys as _s
    if scenario == "index":
        idx = proto.decrypt_index(out)
        ok = 0 in idx
        print(f"# index result (expect planted 0): {sorted(idx)[:5]}",
              file=_s.stderr)
    else:
        ok = bool(proto.decrypt_membership(out))
        print(f"# membership result (expect True): {ok}", file=_s.stderr)
    if not ok:
        print("# CORRECTNESS FAILURE", file=_s.stderr)
    return ok


if __name__ == "__main__":
    main()
