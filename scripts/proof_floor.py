"""Exact node-count accounting for the proof-size floor (VERDICT r3
item 7): why the transcript-pruned v3 codec lands at ~218 kB at 2^13
against the ~63-65 kB folklore figure for 'a MiMC STARK'.

Builds the canonical 2^13 proof (oracle prover), replays the codec's
_Layout, and counts per tree: slots referenced, distinct nodes,
derivable nodes (hash-reconstructible), and the resulting wire bytes.
Writes proof_floor.json and prints a markdown table for BASELINE.md.
"""

import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle import stark as ostark
from starks_tpu import serialize as ser

STEPS = 8192
CONSTS = [(i ** 7) ^ 42 for i in range(64)]
INP = 3

proof = ostark.mk_mimc_proof(INP, STEPS, CONSTS)
m_root, l_root, main_branches, lc_branches, fri_proof = proof
shape = ser._proof_shape(proof)
col_roots = [comp[0] for comp in fri_proof[:-1]]
lay = ser._Layout(shape, m_root, l_root, col_roots, 8, 8)

derived = lay.derivable()

per_tree = defaultdict(lambda: {"slots": 0, "slot_bytes": 0,
                                "distinct": set(), "leaf_size": 0})
raw_bytes = 0
raw_count = 0
for s in lay.slots:
    if s[0] == 'raw':
        raw_count += 1
        raw_bytes += s[1]
        continue
    _, tree, level, idx, size = s
    t = per_tree[tree]
    t["slots"] += 1
    t["slot_bytes"] += size
    t["distinct"].add((level, idx))
    if level == 0:
        t["leaf_size"] = size

rows = []
tot = {"slots": 0, "slot_bytes": 0, "distinct": 0, "distinct_bytes": 0,
       "derivable": 0, "derivable_bytes": 0, "wire": 0, "wire_bytes": 0}
for tree in sorted(per_tree, key=lambda t: (t != 'M', t != 'L', t)):
    t = per_tree[tree]
    leaf_sz = t["leaf_size"]
    dist_leaves = sum(1 for (lv, _) in t["distinct"] if lv == 0)
    dist_digests = len(t["distinct"]) - dist_leaves
    der = {(lv, i) for (tr, lv, i) in derived if tr == tree}
    der_n = len(der & t["distinct"])
    wire_leaves = dist_leaves   # leaves are never derivable (data)
    wire_digests = dist_digests - der_n
    dist_bytes = dist_leaves * leaf_sz + dist_digests * 32
    wire_bytes = wire_leaves * leaf_sz + wire_digests * 32
    rows.append({
        "tree": tree, "leaf_size": leaf_sz,
        "slots": t["slots"], "slot_bytes": t["slot_bytes"],
        "distinct_leaves": dist_leaves, "distinct_digests": dist_digests,
        "derivable_digests": der_n,
        "wire_leaves": wire_leaves, "wire_digests": wire_digests,
        "wire_bytes": wire_bytes,
    })
    tot["slots"] += t["slots"]
    tot["slot_bytes"] += t["slot_bytes"]
    tot["distinct"] += len(t["distinct"])
    tot["distinct_bytes"] += dist_bytes
    tot["derivable"] += der_n
    tot["derivable_bytes"] += der_n * 32
    tot["wire"] += wire_leaves + wire_digests
    tot["wire_bytes"] += wire_bytes

data = ser.serialize(proof)
report = {
    "steps": STEPS,
    "raw_strings": raw_count, "raw_bytes": raw_bytes,
    "per_tree": rows, "totals": tot,
    "serialized_bytes": len(data),
    "raw_proof_bytes": ser.raw_length(proof),
    "magic": data[:5].hex(),
}
with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "proof_floor.json"), "w") as fh:
    json.dump(report, fh, indent=2)

hdr = ("| tree | leaf B | slot refs | distinct leaves | distinct digests "
       "| derivable digests | wire bytes |")
print(hdr)
print("|---|---|---|---|---|---|---|")
for r in rows:
    print(f"| {r['tree']} | {r['leaf_size']} | {r['slots']} "
          f"| {r['distinct_leaves']} | {r['distinct_digests']} "
          f"| {r['derivable_digests']} | {r['wire_bytes']:,} |")
print(f"| free-standing (roots, FRI base values) | 32 | {raw_count} "
      f"| — | — | — | {raw_bytes:,} |")
print(f"| **total** | | {tot['slots'] + raw_count} | | "
      f"{tot['distinct']} | {tot['derivable']} | "
      f"**{tot['wire_bytes'] + raw_bytes:,}** |")
print()
print(json.dumps({k: v for k, v in report.items() if k != 'per_tree'},
                 indent=2))
