import os
os.environ["JAX_PLATFORMS"] = "cpu"
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from sda_tpu.models import FederatedAggregation
from sda_tpu.ops.mxu8 import (
    Mxu8Context, fused_share_combine_mxu8, planar8_from_batched,
)
from sda_tpu.ops.mxu8 import batched_from_planar_lm
from sda_tpu.ops.modmat import uniform_limbs

for maker, dim in [
    (FederatedAggregation.packed_64bit, 96),
]:
    model = maker(dimension=dim)
    engine = model.engine
    spec, ctx = engine.spec, engine.ctx
    mxu8 = Mxu8Context.create(ctx)
    k_, r_, n_ = spec.secret_count, spec.randomness_count, spec.share_count
    P = 4
    rng = np.random.default_rng(0)

    # --- ext mode (caller randomness): must match the jnp reference bit-exactly
    secrets = engine.encode_secrets(rng.integers(0, 1 << 60, size=(P, dim)))
    randomness = engine.random_ext(P, rng=rng)
    ext = np.concatenate([secrets, randomness], axis=2)  # [P, nb, k+r, L16]
    ref = engine.combine(engine.share(jnp.asarray(ext)))  # [nb, n, L16]

    lanes = 8
    ext8 = planar8_from_batched(mxu8, jnp.asarray(ext.astype(np.uint32)), lanes)
    out = fused_share_combine_mxu8(
        mxu8, spec.share_matrix, ext8, P, k_, r_, lanes=lanes, interpret=True,
    )
    got = batched_from_planar_lm(out, engine.nb, n_)
    assert np.array_equal(np.asarray(got), np.asarray(ref)), "ext combined mismatch"
    print("ext combined OK")

    # --- ext mode + fused reconstruction: equals reconstruct(ref)
    ref_rec = engine.reconstruct(ref)
    out2 = fused_share_combine_mxu8(
        mxu8, spec.share_matrix, ext8, P, k_, r_, lanes=lanes,
        reconstruct_matrix=spec.reconstruct_matrix, interpret=True,
    )
    got2 = batched_from_planar_lm(out2, engine.nb, 3)
    assert np.array_equal(np.asarray(got2), np.asarray(ref_rec)), "fused recon mismatch"
    print("ext fused-recon OK")

    # --- PRNG mode + fused recon: reveal identity (== sum of secrets mod p)
    sec8 = planar8_from_batched(mxu8, jnp.asarray(secrets.astype(np.uint32)), lanes)
    out3 = fused_share_combine_mxu8(
        mxu8, spec.share_matrix, sec8, P, k_, r_, seed=7, lanes=lanes,
        reconstruct_matrix=spec.reconstruct_matrix, interpret=True,
    )
    got3 = batched_from_planar_lm(out3, engine.nb, 3)
    ref3 = ctx.sum_mod(jnp.asarray(secrets.astype(np.uint32)), axis=0)
    assert np.array_equal(np.asarray(got3), np.asarray(ref3)), "prng reveal mismatch"
    print("prng fused-recon reveal OK")
print("ALL OK")
