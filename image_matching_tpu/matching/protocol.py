"""End-to-end protocol orchestration: enroller + sender + receiver wired
together per approach — the library-level equivalent of the reference's
driver setup (src/main.cpp:236-330)."""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from ..ckks.context import CkksContext, Ciphertext
from ..ckks.params import SchemeParams, compute_required_depth
from .config import MatchConfig
from . import enrollers, receivers, senders

APPROACH_NAMES = {1: "Baseline", 2: "GROTE", 3: "Blind", 4: "HERS", 5: "Diagonal"}


@dataclasses.dataclass
class MatchingProtocol:
    approach: int
    ctx: CkksContext
    cfg: MatchConfig
    sender: senders.Sender
    receiver: receivers.HersReceiver

    @staticmethod
    def setup(approach: int, database: np.ndarray, cfg: Optional[MatchConfig] = None,
              params: Optional[SchemeParams] = None, seed: int = 0,
              ctx: Optional[CkksContext] = None,
              streamed: bool = False, **stream_kw) -> "MatchingProtocol":
        """Build context (depth from computeRequiredDepth), generate keys,
        enroll the database.  With streamed=True (approach 5 only) the DB
        is enrolled seed-compressed into a host-RAM DiagStore and served
        by the double-buffered StreamedDiagonalSender — required once the
        encrypted DB outgrows HBM (2^18+ at production parameters)."""
        cfg = cfg or MatchConfig()
        if ctx is None:
            if params is None:
                depth = compute_required_depth(approach, cfg.comp_depth, cfg.alpha_depth)
                params = SchemeParams.create(mult_depth=depth)
            ctx = CkksContext(params, seed=seed)
        n = database.shape[0]
        if streamed:
            from . import streaming
            assert approach in (4, 5), \
                "streaming is implemented for approaches 4 (HERS) and 5 (HyDia)"
            if approach == 5:
                store = streaming.enroll_diag_streamed(
                    ctx, cfg, database, **stream_kw)
                sender: senders.Sender = streaming.StreamedDiagonalSender(
                    ctx, cfg, store)
            else:
                hstore = streaming.enroll_hers_streamed(
                    ctx, cfg, database, **stream_kw)
                sender = streaming.StreamedHersSender(ctx, cfg, hstore)
        else:
            enroll = {
                1: enrollers.enroll_base,
                2: enrollers.enroll_base,
                3: enrollers.enroll_blind,
                4: enrollers.enroll_hers,
                5: enrollers.enroll_diag,
            }[approach]
            db = enroll(ctx, cfg, database)
            sender = senders.make_sender(approach, ctx, cfg, db)
        receiver = receivers.make_receiver(approach, ctx, cfg, n)
        ctx.gen_power_of_two_rotation_keys()
        ctx.gen_rotation_keys(sender.required_rotations(), force=True)
        return MatchingProtocol(approach, ctx, cfg, sender, receiver)

    # protocol phases (timed individually by the latency harness,
    # mirroring reference src/main.cpp:330-389)

    def encrypt_query(self, query: np.ndarray) -> List[Ciphertext]:
        return self.receiver.encrypt_query(query)

    def membership(self, query_cts: List[Ciphertext]) -> Ciphertext:
        """Jitted end-to-end membership scenario (one XLA program)."""
        return self.sender.run_membership(query_cts)

    def index(self, query_cts: List[Ciphertext]) -> List[Ciphertext]:
        return self.sender.run_index(query_cts)

    def decrypt_membership(self, ct: Ciphertext) -> bool:
        return self.receiver.decrypt_membership(ct)

    def decrypt_index(self, cts: List[Ciphertext]) -> List[int]:
        return self.receiver.decrypt_index(cts)
