"""Extract the reference's fixture poll scenarios into JSON test data.

Reads /root/reference/pallet/src/tests/data.rs (`get_poll_scenario`,
data.rs:187-275) and emits tests/data/ref_scenarios.json with, per scenario:
interactions [(pubkey, data[10])], proof_batches [(pi_a, pi_b, pi_c,
commitment)], the PollOutcome fields, and the expected outcome index —
the inputs of the reference's `invoke_test_poll_scenario!` macro
(extrinsics.rs:1007-1068). This is category-(b) verbatim *data*: real
proofs/outcomes that exist to be matched bit-exactly.

Usage: python tools/extract_ref_scenarios.py
"""

from __future__ import annotations

import ast
import json
import pathlib
import re

DATA_RS = pathlib.Path("/root/reference/pallet/src/tests/data.rs")
OUT = pathlib.Path(__file__).parent.parent / "tests" / "data" / "ref_scenarios.json"


def _scenario_src(text: str, name: str) -> str:
    start = text.index(f"fn {name}()")
    # body runs to the next top-level "fn " or EOF
    nxt = text.find("\nfn ", start + 1)
    seg = text[start:nxt] if nxt != -1 else text[start:]
    return seg


def _rust_to_py(src: str) -> str:
    src = re.sub(r"vec::Vec::from\s*\(", "(", src)
    src = re.sub(r"(PublicKey|ProofData|PollOutcome)\s*\{", "{", src)
    src = re.sub(r"Some\s*\(", "(", src)
    src = re.sub(r"\b([a-z_][a-z_0-9]*)\s*:", r'"\1":', src)
    return src


def _extract_field(pysrc: str, field: str):
    m = re.search(rf'"{field}"\s*:\s*', pysrc)
    if m is None:
        return None
    # value starts after the field marker; literal_eval the balanced expr
    j = m.end()
    while pysrc[j] in " \t\n":
        j += 1
    if pysrc.startswith("None", j):
        return None
    opens = {"(": ")", "[": "]", "{": "}"}
    assert pysrc[j] in opens, pysrc[j : j + 40]
    depth = 0
    k = j
    while True:
        ch = pysrc[k]
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
            if depth == 0:
                break
        k += 1
    return ast.literal_eval(pysrc[j : k + 1])


def extract(name: str) -> dict:
    text = DATA_RS.read_text()
    py = _rust_to_py(_scenario_src(text, name))
    interactions = _extract_field(py, "interactions") or ()
    proofs = _extract_field(py, "proof_batches") or ()
    outcome = _extract_field(py, "outcome")
    m = re.search(r'"expected"\s*:\s*(?:\((\d+)\)|None)', py)
    expected = int(m.group(1)) if m and m.group(1) else None
    out = {
        "interactions": [
            {"pk": [pk["x"], pk["y"]], "data": list(data)}
            for pk, data in interactions
        ],
        "proof_batches": [
            {"pi_a": pd["pi_a"], "pi_b": pd["pi_b"], "pi_c": pd["pi_c"],
             "commitment": list(comm)}
            for pd, comm in proofs
        ],
        "expected": expected,
        "outcome": None,
    }
    if outcome is not None:
        out["outcome"] = {
            "tally_results": list(outcome["tally_results"]),
            "tally_result_proofs": [
                [[list(sib) for sib in level] for level in per_option]
                for per_option in outcome["tally_result_proofs"]
            ],
            "total_spent": list(outcome["total_spent"]),
            "total_spent_salt": list(outcome["total_spent_salt"]),
            "tally_result_salt": list(outcome["tally_result_salt"]),
            "new_results_commitment": list(outcome["new_results_commitment"]),
            "spent_votes_hash": list(outcome["spent_votes_hash"]),
        }
    return out


def main():
    scenarios = {str(i): extract(f"poll_scenario_{i}") for i in (0, 1, 2)}
    for i, s in scenarios.items():
        print(f"scenario {i}: {len(s['interactions'])} interactions, "
              f"{len(s['proof_batches'])} proofs, expected={s['expected']}, "
              f"outcome={'yes' if s['outcome'] else 'no'}")
    OUT.write_text(json.dumps(scenarios))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
