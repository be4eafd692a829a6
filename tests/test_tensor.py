"""Tensor parallelism inside one ciphertext: slot-sharded CKKS ops must
produce bit-identical results to the single-device path (XLA's SPMD
partitioner supplies the collectives; parallel/tensor.py).  The limb-axis
mode was deleted in round 5 (it replicated at production limb counts)."""

import numpy as np
import pytest
import jax

pytestmark = pytest.mark.slow

from image_matching_tpu.ckks.params import SchemeParams
from image_matching_tpu.ckks.context import CkksContext, Ciphertext
from image_matching_tpu.parallel.tensor import TensorParallel, make_tp_mesh

RING = 512


@pytest.fixture(scope="module")
def ctx():
    params = SchemeParams.create(ring_dim=RING, mult_depth=5, security="none")
    c = CkksContext(params, seed=12)
    c.gen_power_of_two_rotation_keys()
    return c


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs multiple devices")
def test_tp_ntt_matches_single(ctx):
    tp = TensorParallel(ctx, make_tp_mesh(4))
    lim = ctx.q_limbs(4)
    rng = np.random.default_rng(0)
    qs = np.asarray([int(ctx.q_np[i]) for i in lim])[:, None]
    x = (rng.integers(0, 2 ** 31, (len(lim), ctx.n)) % qs).astype(np.uint32)
    import jax.numpy as jnp

    def single(state, a):
        with ctx.bound_state(state):
            return ctx.plan.fwd(a, lim)

    want = np.asarray(jax.jit(single)(ctx.device_state(), jnp.asarray(x)))
    got = np.asarray(tp.ntt_fwd(jnp.asarray(x), lim))
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs multiple devices")
def test_tp_ctmult_rotate_sum_match_single(ctx):
    rng = np.random.default_rng(1)
    va = rng.uniform(-1, 1, ctx.slots)
    vb = rng.uniform(-1, 1, ctx.slots)
    a, b = ctx.encrypt(va), ctx.encrypt(vb)

    single = ctx.rescale_score(ctx.relinearize(ctx.mul(a, b)))
    srot = ctx.binary_rotate(single, 3)
    ssum = ctx.eval_sum(single, 8)

    tp = TensorParallel(ctx, make_tp_mesh(4))
    ta, tb = tp.shard_ct(a), tp.shard_ct(b)
    tprod = tp.mul_relin_rescale(ta, tb)
    trot = tp.rotate(tprod, 3)
    tsum = tp.eval_sum(tprod, 8)

    assert tprod.scale == single.scale
    np.testing.assert_array_equal(np.asarray(tprod.data),
                                  np.asarray(single.data))
    np.testing.assert_array_equal(np.asarray(trot.data), np.asarray(srot.data))
    np.testing.assert_array_equal(np.asarray(tsum.data), np.asarray(ssum.data))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs multiple devices")
def test_tp_scenario_membership_index_match_single():
    """Scenario-level slot-TP: the FULL approach-5 membership/index
    pipeline under an 8-way slot sharding is bit-exact vs the
    single-device sender (VERDICT r3 item 7 — TP as a capability, not an
    op demo)."""
    from image_matching_tpu.ckks.params import compute_required_depth
    from image_matching_tpu.matching.config import MatchConfig
    from image_matching_tpu.matching.protocol import MatchingProtocol
    from image_matching_tpu.parallel.tensor import TPScenario
    from image_matching_tpu.utils import io as dio

    cfg = MatchConfig(vector_dim=64, chunk_len=16)
    depth = compute_required_depth(5, cfg.comp_depth, cfg.alpha_depth)
    params = SchemeParams.create(ring_dim=RING, mult_depth=depth,
                                 security="none")
    c = CkksContext(params, seed=7)
    query, db = dio.gen_dataset(300, 64, seed=7)
    proto = MatchingProtocol.setup(5, db, cfg, ctx=c)
    qcts = proto.encrypt_query(query)

    want_mem = proto.sender.run_membership(qcts)
    want_idx = proto.sender.run_index(qcts)

    tp = TPScenario(proto.sender, make_tp_mesh(8))
    got_mem = tp.membership(qcts)
    got_idx = tp.index(qcts)

    assert got_mem.scale == want_mem.scale
    np.testing.assert_array_equal(np.asarray(got_mem.data),
                                  np.asarray(want_mem.data))
    assert proto.decrypt_membership(got_mem) is True
    assert len(got_idx) == len(want_idx)
    for g, w in zip(got_idx, want_idx):
        np.testing.assert_array_equal(np.asarray(g.data), np.asarray(w.data))
    assert 0 in proto.decrypt_index(got_idx)
