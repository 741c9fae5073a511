"""Exact byte accounting of the v3 pruned proof encoding at 2^13
(VERDICT r4 ask #8): where every wire byte goes, how many tree nodes
the transcript forces, and what the irreducible floor of THIS
transcript is (without field arithmetic in the decoder).

Runs the pure-Python oracle prover (CPU only) and instruments the
v3 slot stream. Writes scripts/proof_size_accounting.json and prints
a markdown table for BASELINE.md.
"""
import json
import os
import sys
import time
from collections import defaultdict

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from oracle.stark import mk_mimc_proof
from starks_tpu import serialize as ser

STEPS = 2 ** 13
CONSTANTS = [(i ** 7) ^ 42 for i in range(64)]

t0 = time.time()
proof = mk_mimc_proof(3, STEPS, CONSTANTS)
print(f"# oracle prove: {time.time() - t0:.1f}s", file=sys.stderr)

data = ser.serialize(proof)
assert data[:5] == b'STPU\x03', "v3 codec did not engage"

# Re-run the layout exactly as _serialize_pruned does, instrumented.
m_root, l_root, main_branches, lc_branches, fri_proof = proof
shape = ser._proof_shape(proof)
col_roots = [c[0] for c in fri_proof[:-1]]
layout = ser._Layout(shape, m_root, l_root, col_roots, 8, 8)
strings = ser._flatten(proof)
derivable = layout.derivable()

spot, main_depth, fri_meta, n_final = shape
head_bytes = (5 + 6 + 2 + 2 * len(fri_meta) + 4
              + (len(layout.slots) + 3) // 4)

stats = defaultdict(lambda: {"slots": 0, "emitted": 0, "ref": 0,
                             "skip_derivable": 0, "skip_dup_node": 0,
                             "bytes": 0})
seen = {}
emitted_nodes = set()
total_payload = 0
for s, b in zip(layout.slots, strings):
    if s[0] == 'node':
        tree, level, idx, size = s[1], s[2], s[3], s[4]
        sec = f"{tree}/leaves" if level == 0 else f"{tree}/siblings"
    else:
        sec = "raw(roots+final)"
        size = s[1]
    st = stats[sec]
    st["slots"] += 1
    if s[0] == 'node':
        key = s[1:4]
        if key in derivable:
            st["skip_derivable"] += 1
            continue
        if key in emitted_nodes:
            st["skip_dup_node"] += 1
            continue
        emitted_nodes.add(key)
    if b in seen:
        st["ref"] += 1
        st["bytes"] += 2
        total_payload += 2
    else:
        st["emitted"] += 1
        st["bytes"] += len(b)
        total_payload += len(b)
        if len(seen) < 65535:
            seen[b] = len(seen)

# Information-content floor: bytes of distinct strings that are neither
# derivable-by-hash nor duplicates — the minimum ANY hash-only decoder
# must receive for this transcript (ignoring all framing/tag overhead).
floor_bytes = sum(st["bytes"] - 2 * st["ref"] for st in stats.values())

report = {
    "steps": STEPS,
    "v3_total_bytes": len(data),
    "header_and_tag_bytes": head_bytes,
    "payload_bytes": total_payload,
    "n_slots": len(layout.slots),
    "sections": {k: dict(v) for k, v in sorted(stats.items())},
    "floor_distinct_underivable_bytes": floor_bytes,
    "overhead_vs_floor_bytes": len(data) - floor_bytes,
}
with open(os.path.join(_REPO, "scripts",
                       "proof_size_accounting.json"), "w") as fh:
    json.dump(report, fh, indent=2)

print("| section | slots | emitted | 2B refs | skip(derivable) | "
      "skip(dup node) | wire bytes |")
print("|---|---|---|---|---|---|---|")
for k, st in sorted(stats.items()):
    print(f"| {k} | {st['slots']} | {st['emitted']} | {st['ref']} | "
          f"{st['skip_derivable']} | {st['skip_dup_node']} | "
          f"{st['bytes']} |")
print(f"\nheader+tags: {head_bytes} B; payload: {total_payload} B; "
      f"total v3: {len(data)} B")
print(f"distinct underivable content: {floor_bytes} B; "
      f"framing overhead: {len(data) - floor_bytes} B")
