"""Canonical proof serialization + compression.

Framework equivalent of `starks/compression.py` (SURVEY.md §3.1), two
formats:

v1 ('STPU\\x01'): structural encoding with exact-string deduplication —
  repeated >=32-byte strings become 3-byte back-references. Kept for
  reading old artifacts.

v2 ('STPU\\x02'): transcript-aware MERKLE-PRUNED encoding. Both codec
  sides replay the proof's own Fiat-Shamir index derivation (from the
  roots already inside the proof, SURVEY §A.5), reconstruct which tree
  node every byte-string is (the proof's shape is fully determined by
  (steps, config)), and then:
    - emit each distinct node at most once (u16 back-refs),
    - OMIT every sibling node that the decoder can recompute by hashing
      transmitted nodes upward (the multi-branch "frontier" property:
      when two branches share an ancestor, each branch's nodes below the
      merge point determine the other's sibling at the merge level),
    - pool trees that the transcript commits to twice (the L-tree is
      re-merkelized as FRI round 0's row tree; FRI round r's column tree
      is round r+1's row tree — same contents, shared nodes).
  Decompression reconstructs the exact original proof object (pure
  blake2s hashing, no field arithmetic) — round-trip identity is tested
  in tests/test_serialize.py.

Size floor note (measured at steps=2^13): the raw proof is ~556 kB of
byte-strings, of which ~282 kB are distinct; v1 lands at ~347 kB, v2 at
~220 kB. The remaining bytes are the transcript's actual information
content — 320 96-byte P||D||B leaves plus ~4k underivable sibling
digests — which no encoding of THIS transcript can drop without field
arithmetic in the decoder.
"""

import logging
import struct

from .transcript import blake, pseudorandom_indices

_log = logging.getLogger(__name__)

_MAGIC_V1 = b'STPU\x01'
_MAGIC_V2 = b'STPU\x02'
_MAGIC_V3 = b'STPU\x03'   # v2 + explicit augmented-offset (ext) byte


# ---------------------------------------------------------------------------
# v1: structural + exact dedup (legacy)
# ---------------------------------------------------------------------------

def serialize_v1(proof) -> bytes:
    out = [_MAGIC_V1]
    seen = {}

    def emit(node):
        if isinstance(node, bytes):
            if node in seen:
                out.append(b'\x02' + seen[node].to_bytes(3, 'big'))
            else:
                if len(node) >= 32:
                    seen[node] = len(seen)
                out.append(b'\x01' + struct.pack('>H', len(node)) + node)
        elif isinstance(node, (list, tuple)):
            out.append(b'\x03' + len(node).to_bytes(3, 'big'))
            for item in node:
                emit(item)
        else:
            raise TypeError(f"cannot serialize {type(node)}")

    emit(proof)
    return b''.join(out)


def _deserialize_v1(data: bytes):
    pos = [5]
    seen = []

    def parse():
        tag = data[pos[0]]
        pos[0] += 1
        if tag == 0x01:
            (ln,) = struct.unpack_from('>H', data, pos[0])
            pos[0] += 2
            node = data[pos[0]:pos[0] + ln]
            pos[0] += ln
            if ln >= 32:
                seen.append(node)
            return node
        if tag == 0x02:
            idx = int.from_bytes(data[pos[0]:pos[0] + 3], 'big')
            pos[0] += 3
            return seen[idx]
        if tag == 0x03:
            count = int.from_bytes(data[pos[0]:pos[0] + 3], 'big')
            pos[0] += 3
            return [parse() for _ in range(count)]
        raise ValueError(f"bad tag {tag} at {pos[0] - 1}")

    out = parse()
    assert pos[0] == len(data), "trailing bytes in proof"
    return out


# ---------------------------------------------------------------------------
# v2: transcript-aware pruned encoding
# ---------------------------------------------------------------------------

class _Layout:
    """The proof's slot list: every byte-string in canonical order tagged
    with its (tree, level, node-index) — or None for free-standing
    strings (roots, final FRI values). Derived identically by encoder
    and decoder from the proof SHAPE plus Fiat-Shamir replay, so only
    the shape ints travel on the wire."""

    def __init__(self, shape, m_root, l_root, col_roots,
                 exclude_multiples_of, extension_factor=None):
        (self.spot_checks, self.main_depth, self.fri_meta,
         self.n_final) = shape
        precision = 1 << self.main_depth
        self.precision = precision
        ex = exclude_multiples_of

        positions = pseudorandom_indices(
            l_root, precision, self.spot_checks, exclude_multiples_of=ex)
        # Augmented partner offset = the config's extension factor. In
        # the canonical transcript it equals the FS exclusion period;
        # the v3 header carries it explicitly so non-default configs
        # decode correctly (and serialize() self-checks regardless).
        ext = extension_factor if extension_factor else (ex if ex else 8)
        aug = []
        for p in positions:
            aug += [p, (p + ext) % precision]

        # trees[name] = (leaf_count, leaf_size)
        self.trees = {'M': (precision, 96), 'L': (precision, 32)}
        # slots: list of ('node', tree, level, idx, size) |
        #        ('raw', size) in canonical proof order.
        slots = [('raw', 32), ('raw', 32)]      # m_root, l_root
        for a in aug:
            slots += self._branch_slots('M', a, self.main_depth, 96)
        for p in positions:
            slots += self._branch_slots('L', p, self.main_depth, 32)

        row_tree = 'L'
        n = precision
        for r, _ in enumerate(self.fri_meta):
            quarter = n // 4
            col_tree = f'C{r}'
            self.trees[col_tree] = (quarter, 32)
            depth = quarter.bit_length() - 1
            ys = pseudorandom_indices(col_roots[r], quarter,
                                      self.fri_meta[r],
                                      exclude_multiples_of=ex)
            slots.append(('raw', 32))           # column root
            for y in ys:
                slots += self._branch_slots(col_tree, y, depth, 32)
                for j in range(4):
                    slots += self._branch_slots(
                        row_tree, y + quarter * j, depth + 2,
                        self.trees[row_tree][1])
            row_tree, n = col_tree, quarter
        for _ in range(self.n_final):
            slots.append(('raw', 32))
        self.slots = slots

    @staticmethod
    def _branch_slots(tree, idx, depth, leaf_size):
        out = [('node', tree, 0, idx, leaf_size),
               ('node', tree, 0, idx ^ 1, leaf_size)]
        node = idx >> 1
        for v in range(1, depth):
            out.append(('node', tree, v, node ^ 1, 32))
            node >>= 1
        return out

    def derivable(self):
        """The set of (tree, level, idx) nodes the decoder can compute by
        hashing other transmitted/derived nodes upward. Identical on
        both sides (pure function of the slot list)."""
        by_tree = {}
        for s in self.slots:
            if s[0] == 'node':
                by_tree.setdefault(s[1], {}).setdefault(s[2], set()).add(s[3])
        derived = set()
        for tree, levels in by_tree.items():
            depth = max(levels) + 1
            avail = set(levels.get(0, ()))
            for v in range(1, depth):
                up = set(x >> 1 for x in avail
                         if (x ^ 1) in avail and x % 2 == 0)
                here = set(levels.get(v, ()))
                derived |= {(tree, v, i) for i in (here & up)}
                avail = up | here
        return derived


def _proof_shape(proof):
    """(spot_checks, main_depth, fri_meta, n_final) from the proof
    object's own shape."""
    m_root, l_root, main_branches, lc_branches, fri_proof = proof
    spot = len(lc_branches)
    main_depth = len(main_branches[0]) - 1
    fri_meta = [len(comp[1]) for comp in fri_proof[:-1]]
    n_final = len(fri_proof[-1])
    return (spot, main_depth, fri_meta, n_final)


def _flatten(proof):
    out = []

    def walk(node):
        if isinstance(node, bytes):
            out.append(node)
        else:
            for x in node:
                walk(x)
    walk(proof)
    return out


def _proof_eq(a, b):
    if isinstance(a, bytes) or isinstance(b, bytes):
        return a == b
    if len(a) != len(b):
        return False
    return all(_proof_eq(x, y) for x, y in zip(a, b))


def serialize(proof, exclude_multiples_of: int = 8,
              extension_factor: int = None) -> bytes:
    """Canonical proof encoding. Tries the transcript-pruned v3 codec
    and SELF-CHECKS it (decode-and-compare): pruning relies on a
    Fiat-Shamir replay that silently diverges if the caller's
    exclude_multiples_of / extension_factor don't match the proof's
    actual transcript, so any mismatch — or any non-MiMC proof shape
    (e.g. AIR 6-element objects) — falls back to the structural v1
    codec, which encodes arbitrary nested bytes objects. Round-trip
    identity therefore holds for EVERY input."""
    try:
        data = _serialize_pruned(proof, exclude_multiples_of,
                                 extension_factor)
        if _proof_eq(deserialize(data), proof):
            return data
        _log.warning("pruned v3 codec failed round-trip self-check; "
                     "falling back to structural v1 encoding")
    except Exception:
        # Expected for non-MiMC proof shapes (AIR 6-element objects);
        # a regression that breaks v3 for ordinary MiMC proofs would
        # otherwise silently balloon proof sizes (ADVICE r3) — log it.
        _log.debug("pruned v3 codec raised; falling back to v1",
                   exc_info=True)
    return serialize_v1(proof)


def _serialize_pruned(proof, exclude_multiples_of: int,
                      extension_factor: int = None) -> bytes:
    """v3 pruned encoding (see module docstring)."""
    m_root, l_root, main_branches, lc_branches, fri_proof = proof
    shape = _proof_shape(proof)
    col_roots = [comp[0] for comp in fri_proof[:-1]]
    ext = (extension_factor if extension_factor
           else (exclude_multiples_of if exclude_multiples_of else 8))
    layout = _Layout(shape, m_root, l_root, col_roots,
                     exclude_multiples_of, ext)
    strings = _flatten(proof)
    assert len(strings) == len(layout.slots), \
        (len(strings), len(layout.slots))

    derivable = layout.derivable()
    spot, main_depth, fri_meta, n_final = shape
    head = [_MAGIC_V3,
            struct.pack('>HBBH', spot, main_depth, len(fri_meta), n_final),
            bytes([exclude_multiples_of]), bytes([ext]),
            b''.join(struct.pack('>H', q) for q in fri_meta)]

    # Tag stream: 2 bits/slot (0=skip, 1=raw, 2=ref), then payload.
    tags = []
    payload = []
    seen = {}
    emitted_nodes = {}       # (tree, level, idx) -> first emission
    for s, b in zip(layout.slots, strings):
        if s[0] == 'node':
            key = s[1:4]
            # Skip (zero wire bytes) when the decoder can derive the
            # node by hashing, or when this exact tree node was already
            # emitted for an earlier slot.
            if key in derivable or key in emitted_nodes:
                tags.append(0)
                continue
            emitted_nodes[key] = True
        if b in seen:
            tags.append(2)
            payload.append(struct.pack('>H', seen[b]))
        else:
            tags.append(1)
            payload.append(b)
            if len(seen) < 65535:
                seen[b] = len(seen)
    packed = bytearray((len(tags) + 3) // 4)
    for i, t in enumerate(tags):
        packed[i >> 2] |= t << ((i & 3) * 2)
    head.append(struct.pack('>I', len(tags)))
    head.append(bytes(packed))
    return b''.join(head) + b''.join(payload)


def deserialize(data: bytes):
    if data[:5] == _MAGIC_V1:
        return _deserialize_v1(data)
    assert data[:5] in (_MAGIC_V2, _MAGIC_V3), "bad proof header"
    is_v3 = data[:5] == _MAGIC_V3
    off = 5
    spot, main_depth, n_rounds, n_final = struct.unpack_from('>HBBH',
                                                             data, off)
    off += 6
    ex = data[off]
    off += 1
    if is_v3:
        ext = data[off]
        off += 1
    else:
        ext = ex if ex else 8
    fri_meta = [struct.unpack_from('>H', data, off + 2 * i)[0]
                for i in range(n_rounds)]
    off += 2 * n_rounds
    (n_tags,) = struct.unpack_from('>I', data, off)
    off += 4
    packed = data[off:off + (n_tags + 3) // 4]
    off += (n_tags + 3) // 4
    tags = [(packed[i >> 2] >> ((i & 3) * 2)) & 3 for i in range(n_tags)]

    # First pass: read raw/ref strings for non-skip slots; slot sizes and
    # skip resolution need the layout, which needs the roots — and the
    # roots are always the FIRST raw slots of their section, so we parse
    # incrementally: build the layout lazily per section.
    # Simpler: two-phase — phase 1 parses with a provisional layout that
    # only needs sizes, which requires the roots... The roots themselves
    # are raw slots parsed in order, so we interleave:
    shape = (spot, main_depth, fri_meta, n_final)

    pos = [off]
    seen = []

    def read(nbytes, tag):
        if tag == 1:
            b = data[pos[0]:pos[0] + nbytes]
            pos[0] += nbytes
            if len(seen) < 65535:
                seen.append(b)
            return b
        if tag == 2:
            (idx,) = struct.unpack_from('>H', data, pos[0])
            pos[0] += 2
            return seen[idx]
        return None                       # skip: derived later

    # We must know each slot's size up-front; sizes depend only on the
    # shape ints (not on the roots), but WHICH slots exist depends on
    # indices... no: the slot LIST (count+sizes) is index-independent —
    # indices only name the nodes. So build a size-only slot list first.
    sizes = [32, 32]
    for _ in range(2 * spot):
        sizes += [96, 96] + [32] * (main_depth - 1)
    for _ in range(spot):
        sizes += [32, 32] + [32] * (main_depth - 1)
    depth = main_depth - 2
    for r in range(n_rounds):
        sizes.append(32)
        for _ in range(fri_meta[r]):
            sizes += [32, 32] + [32] * (depth - 1)
            for _ in range(4):
                sizes += [32, 32] + [32] * (depth + 2 - 1)
        depth -= 2
    sizes += [32] * n_final
    assert len(sizes) == n_tags, (len(sizes), n_tags)

    values = [read(sz, t) for sz, t in zip(sizes, tags)]

    # Rebuild layout from the recovered roots, then derive skips.
    m_root, l_root = values[0], values[1]
    # Column roots are the 'raw' slots that precede each round's
    # branches; find them by replaying the slot structure.
    idx = 2 + 2 * spot * (main_depth + 1) + spot * (main_depth + 1)
    col_roots = []
    depth = main_depth - 2
    for r in range(n_rounds):
        col_roots.append(values[idx])
        idx += 1 + fri_meta[r] * ((depth + 1) + 4 * (depth + 3))
        depth -= 2
    layout = _Layout(shape, m_root, l_root, col_roots, ex, ext)
    assert len(layout.slots) == n_tags

    # Resolve skipped nodes: full bottom-up closure per tree — compute
    # every parent whose two children are known (this is exactly the
    # closure `_Layout.derivable()` promised; derived slots may hang off
    # intermediate path nodes that are not slots themselves).
    node_val = {}
    by_tree = {}
    for s, v in zip(layout.slots, values):
        if s[0] == 'node' and v is not None:
            node_val[s[1:4]] = v
            by_tree.setdefault(s[1], {}).setdefault(s[2], {})[s[3]] = v
    needed = {s[1:4] for s, v in zip(layout.slots, values)
              if s[0] == 'node' and v is None}
    max_lev = {}
    for tree, v, i in needed:
        max_lev[tree] = max(max_lev.get(tree, 0), v)
    for tree, top in max_lev.items():
        levels = by_tree.setdefault(tree, {})
        for v in range(1, top + 1):
            cur = levels.get(v - 1, {})
            up = levels.setdefault(v, {})
            for i, val in cur.items():
                if i % 2 == 0 and (i + 1) in cur and (i >> 1) not in up:
                    d = blake(val + cur[i + 1])
                    up[i >> 1] = d
                    node_val[(tree, v, i >> 1)] = d
    missing = needed - set(node_val)
    if missing:
        raise ValueError(f"undecodable proof: {len(missing)} missing nodes")

    out_vals = [node_val[s[1:4]] if v is None else v
                for s, v in zip(layout.slots, values)]

    # Reassemble the nested proof object.
    it = iter(out_vals)
    m_root = next(it)
    l_root = next(it)

    def take_branch(depth):
        return [next(it) for _ in range(depth + 1)]

    main_branches = [take_branch(main_depth) for _ in range(2 * spot)]
    lc_branches = [take_branch(main_depth) for _ in range(spot)]
    fri_proof = []
    depth = main_depth - 2
    for r in range(n_rounds):
        root = next(it)
        branches = []
        for _ in range(fri_meta[r]):
            col = take_branch(depth)
            rows = [take_branch(depth + 2) for _ in range(4)]
            branches.append([col] + rows)
        fri_proof.append([root, branches])
        depth -= 2
    fri_proof.append([next(it) for _ in range(n_final)])
    assert pos[0] == len(data), "trailing bytes in proof"
    return [m_root, l_root, main_branches, lc_branches, fri_proof]


def bin_length(proof) -> int:
    """Compressed serialized size in bytes (v2 codec)."""
    return len(serialize(proof))


def raw_length(proof) -> int:
    """Uncompressed payload size (no dedup; framing included)."""
    if isinstance(proof, bytes):
        return len(proof) + 3
    if isinstance(proof, (list, tuple)):
        return sum(raw_length(x) for x in proof) + 4
    raise TypeError(f"cannot size {type(proof)}")
