"""Receivers: client-side query encryption and result decryption/decoding
(reference src/receiver/*.cpp; SURVEY.md section 2.4)."""

from __future__ import annotations

import math
from typing import List, Sequence

import numpy as np

from ..ckks.context import CkksContext, Ciphertext
from .config import MatchConfig
from .vector_utils import normalize


class HersReceiver:
    """Approach 4: the query becomes vector_dim ciphertexts, each with one
    feature replicated in every slot (reference receiver_hers.cpp:13-24)."""

    def __init__(self, ctx: CkksContext, cfg: MatchConfig, num_vectors: int):
        self.ctx = ctx
        self.cfg = cfg
        self.num_vectors = num_vectors

    def encrypt_query(self, query: np.ndarray) -> List[Ciphertext]:
        q = normalize(np.asarray(query, dtype=np.float64))
        if self.cfg.hers_alt_query:
            # encryptQueryAlt (reference receiver_hers.cpp:66-77): one
            # ciphertext with the query replicated every vector_dim slots;
            # the sender expands it server-side (senders.expand_query_alt)
            reps = self.ctx.slots // self.cfg.vector_dim
            return [self.ctx.encrypt(np.tile(q, reps))]
        vals = np.repeat(q[:, None], self.ctx.slots, axis=1)
        data = self.ctx.encrypt_batch(vals)
        return [
            Ciphertext(data[i], self.ctx.fresh_scale)
            for i in range(self.cfg.vector_dim)
        ]

    def decrypt_membership(self, ct: Ciphertext) -> bool:
        """True iff slot 0 >= 1.0 (reference receiver_hers.cpp:26-35)."""
        return bool(self.ctx.decrypt(ct)[0] >= 1.0)

    def decrypt_index(self, cts: Sequence[Ciphertext]) -> List[int]:
        """Every slot >= 1.0 maps to DB id j + i*batch
        (reference receiver_hers.cpp:37-54)."""
        batch = self.ctx.slots
        out = []
        for i, ct in enumerate(cts):
            vals = self.ctx.decrypt(ct)
            for j in np.nonzero(vals >= 1.0)[0]:
                idx = int(j) + i * batch
                if idx < self.num_vectors:
                    out.append(idx)
        return out

    def decrypt_scores(self, cts: Sequence[Ciphertext]) -> np.ndarray:
        return np.concatenate([self.ctx.decrypt(ct) for ct in cts])


class BaseReceiver(HersReceiver):
    """Approaches 1: query replicated every vector_dim slots into one
    ciphertext (reference receiver_base.cpp:13-26)."""

    def encrypt_query(self, query: np.ndarray) -> List[Ciphertext]:
        q = normalize(np.asarray(query, dtype=np.float64))
        reps = self.ctx.slots // self.cfg.vector_dim
        return [self.ctx.encrypt(np.tile(q, reps))]


class DiagonalReceiver(BaseReceiver):
    """Approach 5: same single replicated-query cipher
    (reference receiver_diag.cpp:13-26); HERS decrypt rules."""


class GroteReceiver(BaseReceiver):
    """Approach 2: decodes group-testing row/col flags
    (reference receiver_grote.cpp:12-65)."""

    def decrypt_index(self, cts: Sequence[Ciphertext]) -> List[int]:
        ctx = self.ctx
        batch = ctx.slots
        row_len = 2 ** math.ceil(math.log2(batch) / 2)
        col_len = batch // row_len
        n_score = math.ceil(self.num_vectors / batch)
        n_row = math.ceil(n_score / row_len)
        n_col = math.ceil(n_score / col_len)
        assert n_row + n_col == len(cts), "bad index result parsing"
        row_vals = np.concatenate([ctx.decrypt(c) for c in cts[:n_row]])
        col_vals = np.concatenate([ctx.decrypt(c) for c in cts[n_row:]])
        rows = np.nonzero(row_vals >= 1.0)[0]
        cols = np.nonzero(col_vals >= 1.0)[0]
        out = []
        for r in rows:
            rm = r // col_len
            for c in cols:
                cm = c // row_len
                if rm == cm:
                    idx = int(r) * row_len + int(c) % row_len
                    if idx < self.num_vectors:
                        out.append(idx)
        return out


class BlindReceiver(HersReceiver):
    """Approach 3: query split into chunks, each replicated across the
    batch (reference receiver_blind.cpp:13-26); index decode inverts the
    compression permutation (receiver_blind.cpp:28-54)."""

    def encrypt_query(self, query: np.ndarray) -> List[Ciphertext]:
        cl = self.cfg.chunk_len
        cpv = self.cfg.vector_dim // cl
        q = normalize(np.asarray(query, dtype=np.float64))
        reps = self.ctx.slots // cl
        vals = np.stack([np.tile(q[i * cl : (i + 1) * cl], reps) for i in range(cpv)])
        data = self.ctx.encrypt_batch(vals)
        return [Ciphertext(data[i], self.ctx.fresh_scale) for i in range(cpv)]

    def decrypt_index(self, cts: Sequence[Ciphertext]) -> List[int]:
        batch = self.ctx.slots
        cl = self.cfg.chunk_len
        spb = batch // cl  # scores per batch
        out = []
        for i, ct in enumerate(cts):
            vals = self.ctx.decrypt(ct)
            for j in np.nonzero(vals >= 1.0)[0]:
                j = int(j)
                idx = i * batch + j // cl + (j % cl) * spb
                if idx < self.num_vectors:
                    out.append(idx)
        return sorted(out)

    def decrypt_scores(self, cts: Sequence[Ciphertext]) -> np.ndarray:
        """Scores in vector order: invert the compression permutation
        (slot j of ciphertext i holds the score of vector
        i*batch + j//cl + (j%cl)*spb — reference receiver_blind.cpp:28-54),
        so parity checks compare like with like."""
        batch = self.ctx.slots
        cl = self.cfg.chunk_len
        spb = batch // cl
        j = np.arange(batch)
        order = j // cl + (j % cl) * spb  # slot -> vector offset
        outs = []
        for ct in cts:
            vals = np.asarray(self.ctx.decrypt(ct))
            inv = np.empty(batch, vals.dtype)
            inv[order] = vals
            outs.append(inv)
        return np.concatenate(outs)


def make_receiver(approach: int, ctx: CkksContext, cfg: MatchConfig,
                  num_vectors: int) -> HersReceiver:
    cls = {1: BaseReceiver, 2: GroteReceiver, 3: BlindReceiver,
           4: HersReceiver, 5: DiagonalReceiver}[approach]
    return cls(ctx, cfg, num_vectors)
