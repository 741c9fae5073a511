"""ctypes loader for the native host runtime (native/starkrt.cpp).

Compiles the shared library once on first use (g++ -O3), caches it next
to the source, and degrades gracefully to the pure-Python paths when a
toolchain is unavailable (set STARKS_TPU_NO_NATIVE=1 to force that).

Element encoding at the ABI: 32 bytes little-endian per field element —
bit-compatible with the framework's uint16-limb layout
(utils/conversions.py), so numpy limb arrays pass through with a plain
view, no per-element re-encode.
"""

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "starkrt.cpp")
_LIB = os.path.join(os.path.dirname(_SRC), "libstarkrt.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """The loaded CDLL, or None if native support is unavailable."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("STARKS_TPU_NO_NATIVE") == "1":
        return None
    if not os.path.exists(_LIB) or (os.path.exists(_SRC) and
                                    os.path.getmtime(_SRC)
                                    > os.path.getmtime(_LIB)):
        if not os.path.exists(_SRC) or not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    for name, argtypes in [
            ("starkrt_mul_array", [u8p, u8p, u8p, ctypes.c_uint64]),
            ("starkrt_add_array", [u8p, u8p, u8p, ctypes.c_uint64]),
            ("starkrt_mimc_trace", [u8p, ctypes.c_uint64, u8p,
                                    ctypes.c_uint64, u8p]),
            ("starkrt_power_table", [u8p, ctypes.c_uint64, u8p]),
            ("starkrt_pow", [u8p, u8p, u8p]),
            ("starkrt_batch_inv", [u8p, u8p, ctypes.c_uint64]),
            ("starkrt_ntt", [u8p, u8p, ctypes.c_uint64, u8p]),
    ]:
        fn = getattr(lib, name)
        fn.argtypes = argtypes
        fn.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _int_to_le32(x: int) -> np.ndarray:
    return np.frombuffer(x.to_bytes(32, "little"), dtype=np.uint8).copy()


def _le32_to_ints(buf: np.ndarray) -> list:
    flat = buf.reshape(-1, 32)
    return [int.from_bytes(row.tobytes(), "little") for row in flat]


def mimc_trace(inp: int, steps: int, round_constants) -> np.ndarray:
    """MiMC trace as a [steps, 16] uint16-limb array (native), or None."""
    lib = get_lib()
    if lib is None:
        return None
    n_c = len(round_constants)
    # constants must be canonical mod p for the native add
    from ..ops.limbs import MODULUS
    consts = np.concatenate([_int_to_le32(c % MODULUS)
                             for c in round_constants])
    out = np.empty(steps * 32, np.uint8)
    lib.starkrt_mimc_trace(_ptr(_int_to_le32(inp % MODULUS)), steps,
                           _ptr(consts), n_c, _ptr(out))
    return out.view("<u2").reshape(steps, 16)


def power_table(g: int, n: int) -> np.ndarray:
    """[n, 16] uint16-limb array of g^0..g^(n-1) (native), or None."""
    lib = get_lib()
    if lib is None:
        return None
    from ..ops.limbs import MODULUS
    out = np.empty(n * 32, np.uint8)
    lib.starkrt_power_table(_ptr(_int_to_le32(g % MODULUS)), n, _ptr(out))
    return out.view("<u2").reshape(n, 16)


def batch_inv_ints(xs: list) -> list:
    """Batch modular inverse of Python ints (native), or None."""
    lib = get_lib()
    if lib is None:
        return None
    from ..ops.limbs import MODULUS
    buf = np.concatenate([_int_to_le32(x % MODULUS) for x in xs])
    out = np.empty_like(buf)
    lib.starkrt_batch_inv(_ptr(buf), _ptr(out), len(xs))
    return _le32_to_ints(out)


def ntt_ints(vals: list, root_of_unity: int, inverse: bool = False) -> list:
    """Host NTT over Python ints (native), or None. Matches
    utils/hostfield.py::host_ntt semantics (natural order in/out)."""
    lib = get_lib()
    if lib is None:
        return None
    from ..ops.limbs import MODULUS
    n = len(vals)
    assert n & (n - 1) == 0
    g = pow(root_of_unity, MODULUS - 2, MODULUS) if inverse else root_of_unity
    roots = power_table(g, n)
    buf = np.concatenate([_int_to_le32(v % MODULUS) for v in vals])
    out = np.empty_like(buf)
    lib.starkrt_ntt(_ptr(buf), _ptr(roots.view(np.uint8).reshape(-1)),
                    n, _ptr(out))
    res = _le32_to_ints(out)
    if inverse:
        n_inv = pow(n, MODULUS - 2, MODULUS)
        res = [x * n_inv % MODULUS for x in res]
    return res
