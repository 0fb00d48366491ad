"""Write the python-side inputs for the real-snarkjs cross-validation:
a toy circuit's .r1cs and .wtns in snarkjs binary format, plus the expected
public inputs. run.sh then drives the REAL snarkjs (pure JS — no circom
needed, since the r1cs comes from our writer) through powersoftau ->
groth16 setup -> prove -> verify over these bytes.

Usage: python tools/snarkjs_fixtures/gen_inputs.py <workdir>
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

from infimum_tpu.groth16.r1cs import ConstraintSystem, LC
from infimum_tpu.io.snarkjs import write_r1cs, write_wtns


def toy_circuit():
    """x*y = prod, x + y = total (publics), with a 4-bit decomposition —
    the same circuit tests/test_snarkjs_io.py roundtrips."""
    cs = ConstraintSystem()
    prod = cs.alloc_public()
    total = cs.alloc_public()
    x = cs.alloc()
    y = cs.alloc()
    cs.enforce(LC.var(x), LC.var(y), LC.var(prod))
    cs.enforce_zero(LC.var(x) + LC.var(y) - LC.var(total))
    cs.num2bits(LC.var(x), 4)
    return cs, {prod: 21, total: 10, x: 3, y: 7}


def main():
    out = pathlib.Path(sys.argv[1])
    out.mkdir(parents=True, exist_ok=True)
    cs, inputs = toy_circuit()
    w = cs.compute_witness(inputs)
    assert cs.check(w)
    (out / "toy.r1cs").write_bytes(write_r1cs(cs, n_outputs=2))
    (out / "toy.wtns").write_bytes(write_wtns(w))
    (out / "expected_public.json").write_text(json.dumps(["21", "10"]))
    print(f"wrote toy.r1cs/toy.wtns to {out}")


if __name__ == "__main__":
    main()
