#!/usr/bin/env bash
# Real-snarkjs cross-validation fixture generator (VERDICT r3 item 4).
#
# Drives the REAL snarkjs npm package over bytes our writers produced and
# captures bytes snarkjs wrote, closing the interop loop that binary
# self-roundtrips cannot: snarkjs runs the powersoftau ceremony + groth16
# setup on OUR toy.r1cs, proves from OUR toy.wtns, and self-verifies; the
# resulting toy.zkey / vk.json / proof.json / public.json land in
# tests/data/snarkjs_real/ where tests/test_snarkjs_real.py consumes them
# (skipped automatically when absent). Requires node>=18 + network
# (npx snarkjs); run from the repo root, e.g. in CI or the Docker image.
set -euo pipefail
cd "$(dirname "$0")/../.."
WORK=$(mktemp -d)
OUT=tests/data/snarkjs_real
SNARKJS="npx --yes snarkjs@0.7.5"

python tools/snarkjs_fixtures/gen_inputs.py "$WORK"

$SNARKJS powersoftau new bn128 8 "$WORK/p0.ptau" -v
$SNARKJS powersoftau contribute "$WORK/p0.ptau" "$WORK/p1.ptau" \
    --name="fixture" -v -e="fixed entropy for reproducible fixtures"
$SNARKJS powersoftau prepare phase2 "$WORK/p1.ptau" "$WORK/final.ptau" -v
$SNARKJS groth16 setup "$WORK/toy.r1cs" "$WORK/final.ptau" "$WORK/toy.zkey"
$SNARKJS zkey export verificationkey "$WORK/toy.zkey" "$WORK/vk.json"
$SNARKJS groth16 prove "$WORK/toy.zkey" "$WORK/toy.wtns" \
    "$WORK/proof.json" "$WORK/public.json"
$SNARKJS groth16 verify "$WORK/vk.json" "$WORK/public.json" "$WORK/proof.json"

mkdir -p "$OUT"
cp "$WORK/toy.zkey" "$WORK/vk.json" "$WORK/proof.json" "$WORK/public.json" \
   "$WORK/toy.r1cs" "$WORK/toy.wtns" "$WORK/expected_public.json" "$OUT/"
echo "fixtures written to $OUT"
