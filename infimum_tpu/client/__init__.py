"""Offchain client: the TPU-native equivalent of the reference CLI layer.

Mirrors the reference's TypeScript client (cli/src/): user roles
(cli/src/user/coordinator.ts, participant.ts), prover orchestration
(cli/src/utils.ts:47-163) and serialization (cli/src/serialize.ts +
cli/lib inf-lib), but chain-free — extrinsics dispatch directly into the
pallet equivalent (pallet/chain.py) and proving runs this stack's native
Groth16 prover instead of snarkjs.
"""

from .user import User, Coordinator, Participant
from .prover import PollProver, ProverKeys

__all__ = ["User", "Coordinator", "Participant", "PollProver", "ProverKeys"]
