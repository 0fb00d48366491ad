"""infimum-tpu: a TPU-native Groth16 proving stack for Infimum's MACI-style voting circuits.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of the reference
(rhysbalevicius/infimum): circom-compatible Poseidon hashing, amortized quinary/binary
Merkle state trees, the poll state machine with its public-signal computation, native
witness generation for the process-messages / tally-votes statements, and a BN254
Groth16 prover (NTT + Pippenger MSM as batched TPU kernels) plus a pairing-based
verifier equivalent to the reference pallet's on-chain verifier
(reference: pallet/src/lib.rs:815-827).
"""

__version__ = "0.1.0"
