"""BabyJubJub, EdDSA-Poseidon, ECDH and Poseidon-cipher round trips."""

from infimum_tpu.curve import babyjubjub as bjj
from infimum_tpu.maci.keys import Keypair, verify, format_priv_key
from infimum_tpu.hash.cipher import poseidon_encrypt, poseidon_decrypt
from infimum_tpu.utils.blake512 import blake512


def test_blake512_vectors():
    assert blake512(bytes(1)).hex() == (
        "97961587f6d970faba6d2478045de6d1fabd09b61ae50932054d52bc29d31be4"
        "ff9102b9f69e2bbdb83be13d4b9c06091e5fa0b48bd081b634058be0ec49beb3"
    )
    assert blake512(bytes(144)).hex() == (
        "313717d608e9cf758dcb1eb0f0c3cf9fc150b2d500fb33f51c52afc99d358a2f"
        "1374b8a38bba7974e7f6ef79cab16f22ce1e649d6e01ad9589c213045d545dde"
    )


def test_babyjubjub_group():
    assert bjj.is_on_curve(bjj.BASE8)
    assert bjj.in_subgroup(bjj.BASE8)
    p = bjj.mul(bjj.BASE8, 12345)
    assert bjj.is_on_curve(p)
    assert bjj.add(p, bjj.neg(p)) == bjj.IDENTITY
    a = bjj.mul(bjj.BASE8, 7)
    b = bjj.mul(bjj.BASE8, 9)
    assert bjj.add(a, b) == bjj.mul(bjj.BASE8, 16)


def test_eddsa_sign_verify():
    kp = Keypair(sk=123456789)
    msg = 987654321
    sig = kp.sign(msg)
    assert verify(kp.pub, msg, sig)
    assert not verify(kp.pub, msg + 1, sig)
    r8, s = sig
    assert not verify(kp.pub, msg, (r8, s + 1))
    kp2 = Keypair(sk=55555)
    assert not verify(kp2.pub, msg, sig)


def test_ecdh_agreement():
    alice, bob = Keypair(sk=111), Keypair(sk=222)
    assert alice.ecdh(bob.pub) == bob.ecdh(alice.pub)
    carol = Keypair(sk=333)
    assert alice.ecdh(bob.pub) != alice.ecdh(carol.pub)


def test_poseidon_cipher_roundtrip():
    key = (123, 456)
    nonce = 7
    msg = [1, 2, 3, 4, 5, 6, 7]  # MACI command: 7 elements -> 10 ct elements
    ct = poseidon_encrypt(msg, key, nonce)
    assert len(ct) == 10
    assert poseidon_decrypt(ct, key, nonce, 7) == msg
    # tamper -> auth failure
    bad = list(ct)
    bad[0] = (bad[0] + 1) % (2**250)
    try:
        poseidon_decrypt(bad, key, nonce, 7)
        assert False, "tampered ciphertext accepted"
    except ValueError:
        pass
    # wrong key -> auth failure
    try:
        poseidon_decrypt(ct, (9, 9), nonce, 7)
        assert False, "wrong key accepted"
    except ValueError:
        pass
