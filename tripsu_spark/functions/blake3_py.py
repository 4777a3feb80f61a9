"""Pure-Python BLAKE3 (hash + keyed mode), implemented from the public
BLAKE3 specification (https://github.com/BLAKE3-team/BLAKE3-specs).

Used for algorithm parity with the reference pseudonymizer
(reference src/crypto.rs:116-120 uses ``blake3::keyed_hash``); the
``blake3`` wheel is not available in this environment. This module is
the readable scalar REFERENCE implementation (and the multi-chunk
fallback); the Spark hot path uses the numpy-vectorized batch
implementation in functions/blake3_np.py (~90x this module's rate),
validated bit-identical against this one. SHA-256 salted hashing
remains the default backend (see tripsu_spark/crypto.py).

Self-tested against the official empty-input test vector in
tests/test_crypto.py.
"""

from __future__ import annotations

import struct

IV = (
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
)
MSG_PERMUTATION = (2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8)

CHUNK_START = 1 << 0
CHUNK_END = 1 << 1
PARENT = 1 << 2
ROOT = 1 << 3
KEYED_HASH = 1 << 4

BLOCK_LEN = 64
CHUNK_LEN = 1024
MASK32 = 0xFFFFFFFF


def _rotr(x: int, n: int) -> int:
    return ((x >> n) | (x << (32 - n))) & MASK32


def _g(state: list[int], a: int, b: int, c: int, d: int, mx: int, my: int) -> None:
    state[a] = (state[a] + state[b] + mx) & MASK32
    state[d] = _rotr(state[d] ^ state[a], 16)
    state[c] = (state[c] + state[d]) & MASK32
    state[b] = _rotr(state[b] ^ state[c], 12)
    state[a] = (state[a] + state[b] + my) & MASK32
    state[d] = _rotr(state[d] ^ state[a], 8)
    state[c] = (state[c] + state[d]) & MASK32
    state[b] = _rotr(state[b] ^ state[c], 7)


def _round(state: list[int], m: list[int]) -> None:
    _g(state, 0, 4, 8, 12, m[0], m[1])
    _g(state, 1, 5, 9, 13, m[2], m[3])
    _g(state, 2, 6, 10, 14, m[4], m[5])
    _g(state, 3, 7, 11, 15, m[6], m[7])
    _g(state, 0, 5, 10, 15, m[8], m[9])
    _g(state, 1, 6, 11, 12, m[10], m[11])
    _g(state, 2, 7, 8, 13, m[12], m[13])
    _g(state, 3, 4, 9, 14, m[14], m[15])


def _compress(
    cv: tuple[int, ...],
    block_words: list[int],
    counter: int,
    block_len: int,
    flags: int,
) -> list[int]:
    state = [
        cv[0], cv[1], cv[2], cv[3], cv[4], cv[5], cv[6], cv[7],
        IV[0], IV[1], IV[2], IV[3],
        counter & MASK32, (counter >> 32) & MASK32, block_len, flags,
    ]
    m = list(block_words)
    for i in range(7):
        _round(state, m)
        if i < 6:
            m = [m[p] for p in MSG_PERMUTATION]
    return [
        (state[i] ^ state[i + 8]) & MASK32 if i < 8 else (state[i] ^ cv[i - 8]) & MASK32
        for i in range(16)
    ]


def _words_from_block(block: bytes) -> list[int]:
    if len(block) < BLOCK_LEN:
        block = block + b"\x00" * (BLOCK_LEN - len(block))
    return list(struct.unpack("<16I", block))


def _chunk_cv(
    key_words: tuple[int, ...], chunk: bytes, chunk_counter: int, flags: int
) -> tuple[int, ...]:
    blocks = [chunk[i : i + BLOCK_LEN] for i in range(0, len(chunk), BLOCK_LEN)] or [b""]
    cv = key_words
    for i, block in enumerate(blocks):
        block_flags = flags
        if i == 0:
            block_flags |= CHUNK_START
        if i == len(blocks) - 1:
            block_flags |= CHUNK_END
        cv = tuple(
            _compress(cv, _words_from_block(block), chunk_counter, len(block), block_flags)[:8]
        )
    return cv


def _root_bytes(out_words: list[int]) -> bytes:
    return struct.pack("<8I", *out_words[:8])


def blake3_digest(data: bytes, key: bytes | None = None) -> bytes:
    """32-byte BLAKE3 digest; keyed mode when ``key`` (32 bytes) given."""
    if key is not None:
        if len(key) != 32:
            raise ValueError("BLAKE3 key must be exactly 32 bytes")
        key_words = tuple(struct.unpack("<8I", key))
        base_flags = KEYED_HASH
    else:
        key_words = IV
        base_flags = 0

    chunks = [data[i : i + CHUNK_LEN] for i in range(0, len(data), CHUNK_LEN)] or [b""]

    if len(chunks) == 1:
        # Single chunk: its last block is the root compression.
        blocks = [
            chunks[0][i : i + BLOCK_LEN] for i in range(0, len(chunks[0]), BLOCK_LEN)
        ] or [b""]
        cv = key_words
        for i, block in enumerate(blocks):
            flags = base_flags
            if i == 0:
                flags |= CHUNK_START
            if i == len(blocks) - 1:
                flags |= CHUNK_END | ROOT
            out = _compress(cv, _words_from_block(block), 0, len(block), flags)
            cv = tuple(out[:8])
        return _root_bytes(out)

    # Multi-chunk: binary merge with a CV stack (spec section 5.1).
    cv_stack: list[tuple[int, ...]] = []
    for counter, chunk in enumerate(chunks):
        cv = _chunk_cv(key_words, chunk, counter, base_flags)
        total = counter + 1
        # Merge completed subtrees, except when this is the final chunk:
        # the final merges must keep two CVs for the root compression.
        if counter < len(chunks) - 1:
            t = total
            while t % 2 == 0:
                left = cv_stack.pop()
                block = list(left) + list(cv)
                cv = tuple(_compress(key_words, block, 0, BLOCK_LEN, base_flags | PARENT)[:8])
                t //= 2
        cv_stack.append(cv)
    # Collapse the stack; the last compression is the root.
    while len(cv_stack) > 1:
        right = cv_stack.pop()
        left = cv_stack.pop()
        block = list(left) + list(right)
        flags = base_flags | PARENT
        if not cv_stack:
            out = _compress(key_words, block, 0, BLOCK_LEN, flags | ROOT)
            return _root_bytes(out)
        cv_stack.append(tuple(_compress(key_words, block, 0, BLOCK_LEN, flags)[:8]))
    raise AssertionError("unreachable")


def blake3_hex(data: bytes, key: bytes | None = None) -> str:
    return blake3_digest(data, key).hex()
