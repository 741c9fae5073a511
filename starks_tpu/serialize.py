"""Canonical proof serialization + compression.

Framework equivalent of `starks/compression.py` (SURVEY.md §3.1): the
proof OBJECT (nested lists of byte strings, §A.8) is the transcript-
compatible interchange form; this module defines a canonical byte
encoding with Merkle-node deduplication — sibling nodes shared between
the 160 main-tree branches, 80 L-tree branches and 40x5 FRI branches per
round appear once, later occurrences become 3-byte back-references. This
is where the reference's ~65 kB proof-size figure comes from; sizes are
reported by `bin_length` and tests/test_serialize.py round-trips the
encoding.

Wire format (all integers big-endian):
  header  'STPU' + version byte 0x01
  node    0x01 + u16 length + raw bytes         (first occurrence)
  ref     0x02 + u24 index                      (repeat of a seen string)
  list    0x03 + u24 count + items
"""

import struct

_MAGIC = b'STPU\x01'


def serialize(proof) -> bytes:
    out = [_MAGIC]
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


def deserialize(data: bytes):
    assert data[:5] == _MAGIC, "bad proof header"
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


def bin_length(proof) -> int:
    """Compressed serialized size in bytes."""
    return len(serialize(proof))


def raw_length(proof) -> int:
    """Uncompressed payload size (no dedup; framing included)."""
    if isinstance(proof, bytes):
        return len(proof) + 3
    if isinstance(proof, (list, tuple)):
        return sum(raw_length(x) for x in proof) + 4
    raise TypeError(f"cannot size {type(proof)}")
