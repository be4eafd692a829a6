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
