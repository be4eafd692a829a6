"""Serialization / checkpoint-resume.

The reference serializes the crypto context, all keys, and the encrypted
database to a `serial/` directory and can resume from it
(READ_FROM_SERIAL, reference include/config.h:26-27, src/main.cpp:122-285;
the serialized DB doubles as the sender's working store).  Here the same
roles are covered with .npz archives of the uint32 RNS arrays plus a JSON
manifest of the scheme parameters; the encrypted DB saves as one memmap-
friendly array per layout.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..ckks.params import SchemeParams
from ..ckks.context import CkksContext
from ..matching import enrollers


def save_context(ctx: CkksContext, dirpath: str):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, "params.json"), "w") as f:
        json.dump(dataclasses.asdict(ctx.params), f)
    arrays = {
        "s_eval": np.asarray(ctx.s_eval),
        "s_eval_std": np.asarray(ctx._s_eval_std),
        "s_coeffs": np.asarray(ctx._s_coeffs),
        "pk_b": np.asarray(ctx.pk_b),
        "pk_a": np.asarray(ctx.pk_a),
        "relin_key": np.asarray(ctx.relin_key),
    }
    for i, (perms, keys) in enumerate(ctx._rot_sets):
        arrays[f"rotset_{i}_perms"] = np.asarray(perms)
        arrays[f"rotset_{i}_keys"] = np.asarray(keys)
    np.savez(os.path.join(dirpath, "keys.npz"), **arrays)
    with open(os.path.join(dirpath, "rotmap.json"), "w") as f:
        json.dump(
            {str(g): {str(s): r for s, r in locs.items()}
             for g, locs in ctx.rot_keys.items()},
            f,
        )


def load_context(dirpath: str, seed: int = 0) -> CkksContext:
    with open(os.path.join(dirpath, "params.json")) as f:
        d = json.load(f)
    d["q_primes"] = tuple(d["q_primes"])
    d["sp_primes"] = tuple(d["sp_primes"])
    params = SchemeParams(**d)
    ctx = CkksContext(params, seed=seed)
    z = np.load(os.path.join(dirpath, "keys.npz"))
    ctx.s_eval = jnp.asarray(z["s_eval"])
    ctx._s_eval_std = z["s_eval_std"]
    ctx._s_coeffs = z["s_coeffs"]
    ctx.pk_b = jnp.asarray(z["pk_b"])
    ctx.pk_a = jnp.asarray(z["pk_a"])
    ctx.relin_key = jnp.asarray(z["relin_key"])
    n_sets = sum(1 for k in z.files if k.endswith("_perms"))
    ctx._rot_sets = [
        (jnp.asarray(z[f"rotset_{i}_perms"]), jnp.asarray(z[f"rotset_{i}_keys"]))
        for i in range(n_sets)
    ]
    with open(os.path.join(dirpath, "rotmap.json")) as f:
        ctx.rot_keys = {
            int(g): {int(s): r for s, r in locs.items()}
            for g, locs in json.load(f).items()
        }
    return ctx


_DB_CLASSES = {
    "base": enrollers.BaseDB,
    "hers": enrollers.HersDB,
    "blind": enrollers.BlindDB,
    "diag": enrollers.DiagDB,
}


def save_db(db, dirpath: str, name: str = "db"):
    os.makedirs(dirpath, exist_ok=True)
    kind = {v: k for k, v in _DB_CLASSES.items()}[type(db)]
    meta = {"kind": kind, "num_vectors": db.num_vectors, "scale": db.scale}
    if kind == "diag":
        meta["bsgs"] = db.bsgs
        meta["n1"] = db.n1
    with open(os.path.join(dirpath, f"{name}.json"), "w") as f:
        json.dump(meta, f)
    np.save(os.path.join(dirpath, f"{name}.npy"), np.asarray(db.data))


def load_db(dirpath: str, name: str = "db"):
    with open(os.path.join(dirpath, f"{name}.json")) as f:
        meta = json.load(f)
    data = jnp.asarray(np.load(os.path.join(dirpath, f"{name}.npy")))
    cls = _DB_CLASSES[meta["kind"]]
    if meta["kind"] == "diag":
        return cls(data, meta["num_vectors"], meta["scale"], meta["bsgs"], meta["n1"])
    return cls(data, meta["num_vectors"], meta["scale"])
