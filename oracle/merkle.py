"""Flat-array Merkle tree with blake2s-256 combining.

Spec: SURVEY.md §4.5 / §A.4 (`starks/merkle_tree.py [~1-70]`): leaves are
the RAW serialized values (ints auto-serialized to 32-byte big-endian;
the main STARK tree uses 96-byte P||D||B composite leaves) stored at
nodes[N..2N); leaves are NOT pre-hashed — the first hash happens at the
parent level, nodes[i] = blake2s(nodes[2i] || nodes[2i+1]); root at
nodes[1]. Branch = [leaf, sibling, ...] bottom-up; verification consumes
index parity per level.
"""

from .utils import blake


def merkelize(L):
    L = [x.to_bytes(32, 'big') if isinstance(x, int) else x for x in L]
    nodes = [b''] * len(L) + L
    for i in range(len(L) - 1, 0, -1):
        nodes[i] = blake(nodes[i * 2] + nodes[i * 2 + 1])
    return nodes


def mk_branch(tree, index):
    index += len(tree) // 2
    o = [tree[index]]
    while index > 1:
        o.append(tree[index ^ 1])
        index //= 2
    return o


def verify_branch(root, index, proof, output_as_int=False):
    # Leaf count = 2^(len(proof)-1); node index = leaf index + leaf count.
    index += 2 ** (len(proof) - 1)
    v = proof[0]
    for p in proof[1:]:
        if index % 2:
            v = blake(p + v)
        else:
            v = blake(v + p)
        index //= 2
    assert v == root
    return int.from_bytes(proof[0], 'big') if output_as_int else proof[0]


def mk_multi_branch(tree, indices):
    return [mk_branch(tree, i) for i in indices]


def verify_multi_branch(root, indices, proof):
    return [verify_branch(root, i, b) for i, b in zip(indices, proof)]
