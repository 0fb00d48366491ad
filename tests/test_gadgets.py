"""Circuit gadget unit tests: Poseidon perm, trees, comparators, BabyJubJub
EC ops and the EdDSA validity bit — witness-checked against host ground truth."""

import pytest

from infimum_tpu.ff.bn254 import FR_MOD
from infimum_tpu.groth16.r1cs import ConstraintSystem, LC
from infimum_tpu.circuits.gadgets import (
    poseidon_gadget, check_root_binary, check_root_quinary,
    less_than, less_eq_than, bits_lt_const, num2bits_strict,
)
from infimum_tpu.circuits.babyjubjub_gadget import (
    edwards_add, scalar_mul, fixed_base_mul, point_equal,
)
from infimum_tpu.circuits.eddsa_gadget import eddsa_poseidon_check
from infimum_tpu.hash.poseidon_host import poseidon
from infimum_tpu.curve import babyjubjub as bjj
from infimum_tpu.maci.keys import Keypair

P = FR_MOD


def _run(build):
    """build(cs, inputs_list) -> list of output LCs; returns their values."""
    cs = ConstraintSystem()
    outs = build(cs)
    w = cs.compute_witness({})
    assert cs.check(w), "gadget constraints unsatisfied"
    return [o.eval(w) for o in outs]


def test_poseidon_gadget_matches_host():
    for inputs in ([1], [1, 2], [1, 2, 3, 4, 5]):
        vals = _run(lambda cs: [poseidon_gadget(cs, [LC.const(x) for x in inputs])])
        assert vals[0] == poseidon(inputs)


def test_tree_gadgets():
    leaves = [LC.const(i) for i in range(4)]
    assert _run(lambda cs: [check_root_binary(cs, leaves)])[0] == \
        poseidon([poseidon([0, 1]), poseidon([2, 3])])
    qleaves = [LC.const(i) for i in range(5)]
    assert _run(lambda cs: [check_root_quinary(cs, qleaves)])[0] == \
        poseidon([0, 1, 2, 3, 4])


def test_comparators():
    assert _run(lambda cs: [less_than(cs, LC.const(3), LC.const(5), 10)])[0] == 1
    assert _run(lambda cs: [less_than(cs, LC.const(5), LC.const(3), 10)])[0] == 0
    assert _run(lambda cs: [less_eq_than(cs, LC.const(5), LC.const(5), 10)])[0] == 1
    assert _run(lambda cs: [less_eq_than(cs, LC.const(6), LC.const(5), 10)])[0] == 0


def test_bits_lt_const():
    def go(cs):
        bits = cs.num2bits(LC.const(100), 8)
        return [bits_lt_const(cs, bits, 101), bits_lt_const(cs, bits, 100),
                bits_lt_const(cs, bits, 99)]

    assert _run(go) == [1, 0, 0]


def test_num2bits_strict_rejects_nothing_valid():
    vals = _run(lambda cs: [sum((b.scale(1 << i) for i, b in
                                 enumerate(num2bits_strict(cs, LC.const(P - 1)))),
                                LC())])
    assert vals[0] == P - 1


def test_edwards_ops_match_host():
    p5 = bjj.mul(bjj.BASE8, 5)
    p7 = bjj.mul(bjj.BASE8, 7)
    want = bjj.add(p5, p7)

    def go(cs):
        x, y = edwards_add(cs, (LC.const(p5[0]), LC.const(p5[1])),
                           (LC.const(p7[0]), LC.const(p7[1])))
        return [x, y]

    assert tuple(_run(go)) == want


def test_scalar_mul_matches_host():
    k = 123456789
    want = bjj.mul(bjj.BASE8, k)

    def go(cs):
        x, y = scalar_mul(cs, LC.const(k),
                          (LC.const(bjj.BASE8[0]), LC.const(bjj.BASE8[1])),
                          nbits=32)
        fx, fy = fixed_base_mul(cs, LC.const(k), nbits=32)
        return [x, y, fx, fy]

    got = _run(go)
    assert tuple(got[:2]) == want
    assert tuple(got[2:]) == want


@pytest.mark.slow
def test_eddsa_gadget_validity_bit():
    kp = Keypair(sk=4242)
    msg = poseidon([1, 2, 3, 4])
    r8, s = kp.sign(msg)

    def go(cs, m=msg, s_val=s):
        return [eddsa_poseidon_check(
            cs,
            (LC.const(kp.pub[0]), LC.const(kp.pub[1])),
            (LC.const(r8[0]), LC.const(r8[1])),
            LC.const(s_val), LC.const(m))]

    assert _run(go)[0] == 1
    # wrong message -> invalid
    assert _run(lambda cs: go(cs, m=poseidon([9])))[0] == 0
    # malformed S (>= subgroup order) -> invalid
    assert _run(lambda cs: go(cs, s_val=bjj.SUB_ORDER))[0] == 0
