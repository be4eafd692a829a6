"""Tensor parallelism inside one ciphertext: slot- and limb-sharded CKKS
ops must produce bit-identical results to the single-device path (XLA's
SPMD partitioner supplies the collectives; parallel/tensor.py)."""

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
    # mult_depth 5 -> 8 fresh limbs: divisible by the 4-device limb mesh
    params = SchemeParams.create(ring_dim=RING, mult_depth=5, security="none")
    c = CkksContext(params, seed=12)
    c.gen_power_of_two_rotation_keys()
    return c


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs multiple devices")
@pytest.mark.parametrize("shard", ["slot", "limb"])
def test_tp_ntt_matches_single(ctx, shard):
    tp = TensorParallel(ctx, make_tp_mesh(4), shard=shard)
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
@pytest.mark.parametrize("shard", ["slot", "limb"])
def test_tp_ctmult_rotate_sum_match_single(ctx, shard):
    rng = np.random.default_rng(1)
    va = rng.uniform(-1, 1, ctx.slots)
    vb = rng.uniform(-1, 1, ctx.slots)
    a, b = ctx.encrypt(va), ctx.encrypt(vb)

    single = ctx.rescale_score(ctx.relinearize(ctx.mul(a, b)))
    srot = ctx.binary_rotate(single, 3)
    ssum = ctx.eval_sum(single, 8)

    tp = TensorParallel(ctx, make_tp_mesh(4), shard=shard)
    ta, tb = tp.shard_ct(a), tp.shard_ct(b)
    tprod = tp.mul_relin_rescale(ta, tb)
    trot = tp.rotate(tprod, 3)
    tsum = tp.eval_sum(tprod, 8)

    assert tprod.scale == single.scale
    np.testing.assert_array_equal(np.asarray(tprod.data),
                                  np.asarray(single.data))
    np.testing.assert_array_equal(np.asarray(trot.data), np.asarray(srot.data))
    np.testing.assert_array_equal(np.asarray(tsum.data), np.asarray(ssum.data))
