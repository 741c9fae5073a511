"""Proof compaction + size accounting.

Spec: SURVEY.md §3.1 "Proof compression" (`starks/compression.py [~1-70]`):
dedupe Merkle nodes shared across multi-branches (compress_branches /
decompress_branches), flatten FRI proofs (compress_fri / decompress_fri),
and report serialized size (bin_length) — the source of the ~60-65 kB
proof-size figure. The byte-level framing here is this project's canonical
encoding (the reference's exact framing was unverifiable — SURVEY §0);
round-trip identity is the tested contract.
"""


def compress_branches(branches):
    """Dedupe 32-byte nodes shared across a list of Merkle branches.

    Each node is emitted once as raw bytes; repeats become a 2-byte
    big-endian back-reference into the stream of previously seen nodes.
    """
    seen = {}
    out = []
    for branch in branches:
        cbranch = []
        for node in branch:
            if node in seen:
                cbranch.append(seen[node].to_bytes(2, 'big'))
            else:
                seen[node] = len(seen)
                cbranch.append(node)
        out.append(cbranch)
    return out


def decompress_branches(compressed):
    seen = []
    out = []
    for cbranch in compressed:
        branch = []
        for node in cbranch:
            if len(node) == 2:
                branch.append(seen[int.from_bytes(node, 'big')])
            else:
                seen.append(node)
                branch.append(node)
        out.append(branch)
    return out


def compress_fri(fri_proof):
    """Compress every round's query-branch bundle; final values pass through."""
    out = []
    for component in fri_proof[:-1]:
        root2, branches = component
        flat = [b for bundle in branches for branch in bundle for b in branch]
        out.append([root2, compress_branches([flat])[0],
                    len(branches), len(branches[0]), len(branches[0][0])])
    out.append(fri_proof[-1])
    return out


def decompress_fri(compressed):
    out = []
    for component in compressed[:-1]:
        root2, cflat, n_bundles, n_branches, branch_len = component
        flat = decompress_branches([cflat])[0]
        branches = []
        pos = 0
        for _ in range(n_bundles):
            bundle = []
            for j in range(n_branches):
                # Column branch is one level shorter than row branches.
                blen = branch_len if j == 0 else branch_len + 2
                bundle.append(flat[pos: pos + blen])
                pos += blen
            branches.append(bundle)
        out.append([root2, branches])
    out.append(compressed[-1])
    return out


def _raw_length(node):
    if isinstance(node, bytes):
        return len(node) + 2
    if isinstance(node, int):
        return 32
    if isinstance(node, (list, tuple)):
        return sum(_raw_length(x) for x in node) + 4
    raise TypeError(f"unsupported proof element {type(node)}")


def bin_length(proof):
    """Serialized size in bytes of a proof object AFTER this module's
    own compression (the reference reports sizes the same way:
    `bin_length` over compress_fri/compress_branches output). Full
    5-element STARK proofs get their branch lists and FRI rounds
    compressed; anything else is sized structurally."""
    if (isinstance(proof, (list, tuple)) and len(proof) == 5 and
            isinstance(proof[0], bytes) and isinstance(proof[1], bytes)):
        m_root, l_root, main_b, lc_b, fri = proof
        return _raw_length([m_root, l_root,
                            compress_branches(main_b),
                            compress_branches(lc_b),
                            compress_fri(fri)])
    return _raw_length(proof)
