"""Host (python-int) circom-compatible Poseidon over BN254 Fr.

Behavioral contract (reference: pallet/src/hash/poseidon.rs:162-208):
  - width t = n_inputs + 1, domain tag 0 prepended,
  - per round: add round constants, S-box x^5 (all elements in the 8 full rounds,
    element 0 only in the partial rounds), then MDS mix,
  - output is state[0].

Used for tree building on the host and as the ground truth for the batched
device Poseidon (poseidon.py).
"""

from __future__ import annotations

from ..ff.bn254 import FR_MOD
from .grain import poseidon_params, FULL_ROUNDS, PARTIAL_ROUNDS, MAX_WIDTH


def poseidon_perm(state: list[int]) -> list[int]:
    """Full Poseidon permutation on a width-t state (plain ints mod r)."""
    t = len(state)
    ark, mds = poseidon_params(t)
    r_p = PARTIAL_ROUNDS[t - 2]
    half = FULL_ROUNDS // 2
    s = [x % FR_MOD for x in state]
    for rnd in range(FULL_ROUNDS + r_p):
        s = [(x + ark[rnd * t + i]) % FR_MOD for i, x in enumerate(s)]
        if rnd < half or rnd >= half + r_p:
            s = [pow(x, 5, FR_MOD) for x in s]
        else:
            s[0] = pow(s[0], 5, FR_MOD)
        s = [
            sum(mds[i][j] * s[j] for j in range(t)) % FR_MOD
            for i in range(t)
        ]
    return s


def poseidon(inputs: list[int]) -> int:
    """circom Poseidon hash: domain tag 0, output element 0."""
    if not 1 <= len(inputs) <= MAX_WIDTH - 1:
        raise ValueError(f"poseidon arity {len(inputs)} unsupported")
    return poseidon_perm([0] + list(inputs))[0]


def poseidon2(a: int, b: int) -> int:
    return poseidon([a, b])
