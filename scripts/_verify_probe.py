import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax; jax.config.update('jax_platforms', 'cpu')
import random
from infimum_tpu.hash.poseidon_host import poseidon
assert poseidon([1]) == 18586133768512220936620570745912940619677854269274689475585506675881198879027
print('poseidon OK', flush=True)

from infimum_tpu.ff.fp import FQ_CTX
from infimum_tpu.ff.bn254 import FQ_MOD, FR_MOD
rng = random.Random(5)
for _ in range(50):
    x = rng.randrange(FQ_MOD)
    assert FQ_CTX.from_mont_int(FQ_CTX.to_mont_int(x)) == x
print('mont roundtrip OK', flush=True)

import numpy as np, jax.numpy as jnp
from infimum_tpu.curve.proj import G1_DEV, G2_DEV
from infimum_tpu.curve.bn254_host import G1_GEN, G2_GEN, g1_mul, g2_mul
pts = [g1_mul(G1_GEN, rng.randrange(1, 1000)) for _ in range(17)]
enc = G1_DEV.encode_affine(pts)
one = np.broadcast_to(np.asarray(G1_DEV.one((len(pts),))), enc[:, 0].shape)
dec = G1_DEV.decode((jnp.asarray(enc[:, 0]), jnp.asarray(enc[:, 1]),
                     jnp.asarray(one)))
assert dec == pts, 'g1 encode/decode roundtrip'
qts = [g2_mul(G2_GEN, rng.randrange(1, 1000)) for _ in range(9)]
enc2 = G2_DEV.encode_affine(qts)
one2 = np.broadcast_to(np.asarray(G2_DEV.one((len(qts),))), enc2[:, 0].shape)
dec2 = G2_DEV.decode((jnp.asarray(enc2[:, 0]), jnp.asarray(enc2[:, 1]),
                      jnp.asarray(one2)))
assert dec2 == qts, 'g2 encode/decode roundtrip'
print('encode/decode batch-inv OK', flush=True)

from infimum_tpu.groth16.r1cs import ConstraintSystem, LC
from infimum_tpu.groth16.groth16 import setup, prove, verify, verify_py
cs = ConstraintSystem()
x = cs.alloc_public()
y = cs.alloc()
cs.hint(y, lambda v: v * v % FR_MOD, (LC.var(x),))
cs.enforce(LC.var(x), LC.var(x), LC.var(y))
w = cs.compute_witness({x: 7})
pk = setup(cs, random.Random(3))
pf = prove(pk, cs, w, rng=random.Random(4))
assert verify(pk.vk, pf, [7]) is True, 'native verify accept'
assert verify_py(pk.vk, pf, [7]) is True, 'python verify accept'
assert verify(pk.vk, pf, [8]) is False, 'native verify reject'
print('groth16 native+python verify OK', flush=True)
print('ALL VERIFY CHECKS PASSED', flush=True)
