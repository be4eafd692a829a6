"""Multi-chip execution: shard the encrypted database across a device mesh.

The reference's only parallelism is OpenMP threads over independent
ciphertexts inside one box (SURVEY.md section 2.6).  The TPU-native
equivalent is data parallelism over the DB's matrix/group axis: each chip
holds a shard of the encrypted DB, computes its scores + compare flags
locally, and the membership reduction becomes a modular psum over ICI —
the cross-chip analog of EvalAddManyInPlace + EvalSum (reference
src/sender/sender_hers.cpp:52-54).

Residues are uint32 mod q with q < 2^31, so a raw lax.psum could wrap for
more than 2 shards; `psum_mod` splits into 16-bit halves, psums those, and
refolds mod q.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ckks.context import CkksContext, Ciphertext
from ..ops import modmath as mm


def make_mesh(n_devices: int | None = None, axis: str = "db") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def psum_mod(x: jnp.ndarray, q: jnp.ndarray, qneg: jnp.ndarray,
             p16: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Modular all-reduce sum of residues < q < 2^31 across a mesh axis.

    A raw lax.psum of uint32 residues can wrap; instead psum the 16-bit
    halves (exact for up to 2^16 shards) and refold with the same
    Montgomery power-of-2^16 constants used by mont_dot.  Montgomery form
    is preserved: the sum of Montgomery forms is the Montgomery form of
    the sum."""
    lo = jax.lax.psum(x & jnp.uint32(0xFFFF), axis_name)
    hi = jax.lax.psum(x >> 16, axis_name)
    return mm.mod_add(
        mm.mont_mul(lo, p16[0], q, qneg),
        mm.mont_mul(hi, p16[1], q, qneg),
        q,
    )


class ShardedScenario:
    """Runs a sender's membership/index scenario with the DB group axis
    sharded over a mesh.  Every layout's leading db.data axis is an
    independent batch of DB groups, so this works for the diagonal and HERS
    layouts unconditionally; for blind/base index decoding, each shard's
    local scores must pack into whole ciphertexts (slots | local work),
    and GROTE's group-testing index path is inherently global (membership
    only here — matching its reference cost model,
    src/sender/sender_grote.cpp:13-36).

    Group counts that do not divide the mesh size are padded with all-zero
    ciphertext groups: a zero ciphertext is a valid encryption of 0, its
    scores sit far below the match threshold, its compare flags are ~0, and
    its slot positions map past num_vectors so receivers already filter
    them."""

    def __init__(self, sender, mesh: Mesh, axis: str = "db"):
        self.sender = sender
        self.mesh = mesh
        self.axis = axis
        self._fns = {}

    def _padded_db(self) -> jnp.ndarray:
        data = self.sender.db.data
        n = self.mesh.shape[self.axis]
        g = data.shape[0]
        if g % n == 0:
            return data
        pad = n - g % n
        zeros = jnp.zeros((pad,) + data.shape[1:], dtype=data.dtype)
        return jnp.concatenate([data, zeros], axis=0)

    def _build(self, kind: str):
        sender = self.sender
        ctx: CkksContext = sender.ctx
        mesh, axis = self.mesh, self.axis
        meta = {}

        def local(state, db_local, qstack):
            old = sender.db.data
            sender.db.data = db_local
            try:
                with ctx.bound_state(state):
                    qcts = [
                        Ciphertext(qstack[i], ctx.fresh_scale)
                        for i in range(qstack.shape[0])
                    ]
                    scores = sender.compute_similarity(qcts)
                    flags = sender._compare_many(scores)
                    if kind == "membership":
                        acc = flags[0]
                        for f in flags[1:]:
                            acc = ctx.add(acc, f)
                        l = acc.limbs
                        q, qneg = ctx._qrow(ctx.q_limbs(l))
                        p16 = ctx.pow16[:, :l][:, :, None]
                        summed = psum_mod(acc.data, q, qneg, p16, axis)
                        out = ctx.eval_sum(Ciphertext(summed, acc.scale), ctx.slots)
                        meta["scale"] = out.scale
                        return out.data
                    meta["scale"] = flags[0].scale
                    return jnp.stack([f.data for f in flags])
            finally:
                sender.db.data = old

        out_spec = P() if kind == "membership" else P(axis)
        fn = jax.jit(
            jax.shard_map(
                local, mesh=mesh, in_specs=(P(), P(axis), P()),
                out_specs=out_spec, check_vma=False,
            )
        )
        return fn, meta

    def membership(self, query_cts: List[Ciphertext]) -> Ciphertext:
        if "membership" not in self._fns:
            self._fns["membership"] = self._build("membership")
        fn, meta = self._fns["membership"]
        qstack = jnp.stack([c.data for c in query_cts])
        data = fn(self.sender.ctx.device_state(), self._padded_db(), qstack)
        return Ciphertext(data, meta["scale"])

    def index(self, query_cts: List[Ciphertext]) -> List[Ciphertext]:
        if "index" not in self._fns:
            self._fns["index"] = self._build("index")
        fn, meta = self._fns["index"]
        qstack = jnp.stack([c.data for c in query_cts])
        data = fn(self.sender.ctx.device_state(), self._padded_db(), qstack)
        return [Ciphertext(data[i], meta["scale"]) for i in range(data.shape[0])]


class ShardedStreamedScenario:
    """Multi-chip × beyond-HBM: stream a host-RAM seed-compressed store
    (matching.streaming._SeededStore) across the mesh.

    The store's group list is partitioned into contiguous blocks — device d
    owns groups [d*per, (d+1)*per) — and each step s ships one group per
    device (its own h2d lane) with one-step lookahead prefetch, then runs
    the group similarity under shard_map.  Compare runs data-parallel over
    the sharded score stack; the membership reduction is a modular psum
    over ICI + EvalSum, exactly like ShardedScenario.  This composes the
    reference's two scaling tricks — OpenMP fan-out and per-op DB
    streaming (src/sender/sender_diag.cpp:70-94) — into one TPU-native
    path for DBs that fit neither HBM nor a single chip's bandwidth.

    Groups whose index falls past the store (uneven partition) are padded
    with all-zero c0 AND a zeroed seeded c1 (`valid=0` in _group_compute),
    i.e. exact encryptions of 0: their flags decode to non-matches and
    their slot ids land past num_vectors, which receivers already filter.

    Use host-resident stores (resident_budget=0): a store pre-promoted to
    one device would need d2h pulls to redistribute."""

    def __init__(self, sender, mesh: Mesh, axis: str = "db"):
        self.sender = sender
        self.mesh = mesh
        self.axis = axis
        self._fns = {}

    # -- sharded per-step inputs ------------------------------------------

    def _partition(self):
        import math
        n = self.mesh.shape[self.axis]
        G = self.sender.store.num_groups
        return math.ceil(G / n), n, G

    def _step_arrays(self, s: int, per: int, n: int, G: int):
        """Sharded c0 [n, dim, L, N] + group-index/valid vectors for step
        s: shard d is device d's group d*per+s (async per-device h2d)."""
        from jax.sharding import NamedSharding
        store = self.sender.store
        devs = list(self.mesh.devices.flat)
        shape0 = tuple(store.groups[0].shape)
        sharding = NamedSharding(self.mesh, P(self.axis))
        bufs, gidx, valid = [], [], []
        zeros = None
        for d in range(n):
            g = d * per + s
            if g < G and s < per:
                arr = store.groups[g]
                if isinstance(arr, jnp.ndarray):
                    arr = np.asarray(arr)  # pre-promoted store: d2h pull
                bufs.append(jax.device_put(
                    np.ascontiguousarray(arr)[None], devs[d]))
                gidx.append(g)
                valid.append(1)
            else:
                if zeros is None:
                    zeros = np.zeros((1,) + shape0, np.uint32)
                bufs.append(jax.device_put(zeros, devs[d]))
                gidx.append(0)
                valid.append(0)
        c0 = jax.make_array_from_single_device_arrays(
            (n,) + shape0, sharding, bufs)
        g_arr = jax.device_put(np.asarray(gidx, np.uint32), sharding)
        v_arr = jax.device_put(np.asarray(valid, np.uint32), sharding)
        return c0, g_arr, v_arr

    # -- shard_map'd segments ----------------------------------------------

    def _step_fn(self):
        if "step" not in self._fns:
            sender, ctx, axis = self.sender, self.sender.ctx, self.axis
            meta = {}

            def local(state, Q, c0, g, valid):
                with ctx.bound_state(state):
                    data, scale = sender._group_compute(
                        Q, c0[0], g[0], valid[0])
                    meta["scale"] = scale
                    return data[None]

            fn = jax.jit(jax.shard_map(
                local, mesh=self.mesh,
                in_specs=(P(), P(), P(axis), P(axis), P(axis)),
                out_specs=P(axis), check_vma=False))
            self._fns["step"] = (fn, meta)
        return self._fns["step"]

    def _reduce_fn(self, fscale: float, shape):
        key = ("reduce", fscale, shape)
        if key not in self._fns:
            ctx, axis = self.sender.ctx, self.axis
            meta = {}

            def local(state, fs):
                with ctx.bound_state(state):
                    l = fs.shape[-2]
                    q, qneg = ctx._qrow(ctx.q_limbs(l))
                    acc = fs[0]
                    for i in range(1, fs.shape[0]):
                        acc = mm.mod_add(acc, fs[i], q)
                    p16 = ctx.pow16[:, :l][:, :, None]
                    summed = psum_mod(acc, q, qneg, p16, axis)
                    out = ctx.eval_sum(
                        Ciphertext(summed, fscale), ctx.slots)
                    meta["scale"] = out.scale
                    return out.data

            fn = jax.jit(jax.shard_map(
                local, mesh=self.mesh, in_specs=(P(), P(axis)),
                out_specs=P(), check_vma=False))
            self._fns[key] = (fn, meta)
        return self._fns[key]

    # -- scenarios ----------------------------------------------------------

    def _sharded_scores(self, query_cts: List[Ciphertext]):
        sender, ctx = self.sender, self.sender.ctx
        per, n, G = self._partition()
        Q = sender._query_stack(query_cts)
        fn, meta = self._step_fn()
        state = ctx.device_state()
        nxt = self._step_arrays(0, per, n, G)
        outs = []
        for s in range(per):
            cur, nxt = nxt, (self._step_arrays(s + 1, per, n, G)
                             if s + 1 < per else None)
            outs.append(fn(state, Q, *cur))
        # [n, per, 2, l', N] sharded on axis 0 -> flat global group order
        # (stack index k = d*per + s = the group id by construction)
        stacked = jnp.stack(outs, axis=1)
        scores = stacked.reshape((n * per,) + outs[0].shape[1:])
        return scores, meta["scale"], per * n

    def membership(self, query_cts: List[Ciphertext]) -> Ciphertext:
        sender = self.sender
        scores, scale, Gp = self._sharded_scores(query_cts)
        fstack, fscale = sender._compare_segments(
            scores, scale, sender.cfg.match_threshold)
        # Zero the padded groups' flags before the sum: compare of an exact
        # encryption of 0 is only ~approx-error-close to 0 per slot, which
        # across `slots` slots visibly skews the membership total.  flag
        # positions k >= num_groups are pads (k = d*per + s = group id);
        # ct * {0,1} stays an exact encryption (0 zeroes both components).
        G = sender.store.num_groups
        if Gp > G:
            mask = (jnp.arange(Gp, dtype=jnp.uint32) < G).astype(jnp.uint32)
            fstack = fstack * mask[:, None, None, None]
        fn, meta = self._reduce_fn(fscale, tuple(fstack.shape))
        data = fn(sender.ctx.device_state(), fstack)
        return Ciphertext(data, meta["scale"])

    def index(self, query_cts: List[Ciphertext]) -> List[Ciphertext]:
        sender = self.sender
        scores, scale, Gp = self._sharded_scores(query_cts)
        fstack, fscale = sender._compare_segments(
            scores, scale, sender.cfg.match_threshold)
        return [Ciphertext(fstack[i], fscale) for i in range(Gp)]
