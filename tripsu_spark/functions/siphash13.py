"""SipHash-1-3 — clean-room from the public SipHash specification
(Aumasson & Bernstein, "SipHash: a fast short-input PRF"; 1 compression
round, 3 finalization rounds).

Why it exists: the reference's JSON type index (io.rs:58-63, written by
index.rs:16-31) keys subjects by Rust's ``std::hash::DefaultHasher``,
which is SipHash-1-3 with an all-zero key; ``Hash for str`` feeds the
UTF-8 bytes followed by a single 0xff length-delimiter byte, and
``finish().to_le()`` is the little-endian u64 (a no-op on LE hosts).
``rust_default_hash_str`` reproduces that exactly, which is what lets
``tripsu pseudo -x type_index.json`` consume an index produced by the
reference binary (interop; validated against the committed fixture
tests/data/reference_type_index.json in tests/test_index_json.py).
"""

from __future__ import annotations

MASK = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, b: int) -> int:
    return ((x << b) | (x >> (64 - b))) & MASK


def _sipround(v0: int, v1: int, v2: int, v3: int) -> tuple[int, int, int, int]:
    v0 = (v0 + v1) & MASK
    v1 = _rotl(v1, 13) ^ v0
    v0 = _rotl(v0, 32)
    v2 = (v2 + v3) & MASK
    v3 = _rotl(v3, 16) ^ v2
    v0 = (v0 + v3) & MASK
    v3 = _rotl(v3, 21) ^ v0
    v2 = (v2 + v1) & MASK
    v1 = _rotl(v1, 17) ^ v2
    v2 = _rotl(v2, 32)
    return v0, v1, v2, v3


def siphash13(data: bytes, k0: int = 0, k1: int = 0) -> int:
    """SipHash-1-3 of ``data`` under the 128-bit key (k0, k1) -> u64."""
    v0 = k0 ^ 0x736F6D6570736575
    v1 = k1 ^ 0x646F72616E646F6D
    v2 = k0 ^ 0x6C7967656E657261
    v3 = k1 ^ 0x7465646279746573

    n = len(data)
    end = n - (n % 8)
    for off in range(0, end, 8):
        m = int.from_bytes(data[off : off + 8], "little")
        v3 ^= m
        v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
        v0 ^= m
    # final block: remaining 0..7 bytes, top byte = len mod 256
    m = int.from_bytes(data[end:], "little") | ((n & 0xFF) << 56)
    v3 ^= m
    v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
    v0 ^= m

    v2 ^= 0xFF
    for _ in range(3):
        v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
    return (v0 ^ v1 ^ v2 ^ v3) & MASK


def rust_default_hash_str(s: str) -> int:
    """u64 a Rust ``DefaultHasher`` produces for ``String``/``&str``:
    SipHash-1-3, zero key, input = UTF-8 bytes + 0xff delimiter."""
    return siphash13(s.encode("utf-8") + b"\xff")


def as_i64(u: int) -> int:
    """Reinterpret a u64 as the i64 with the same bits (Spark LongType
    is signed; both sides of the index join use this reinterpretation)."""
    return u - (1 << 64) if u >= (1 << 63) else u
