"""Prototype: vectorised MD5 over numpy uint8 message matrices.

Computes standard MD5 digests for N variable-length byte strings at
once — pure numpy uint32 lane arithmetic, no per-element Python
objects. Messages are grouped by padded block count; each group runs
the 64-step compression across all its lanes per block.

Validation: bit-identical to hashlib.md5 over random strings of every
length class (0..200 bytes). Throughput A/B vs a hashlib loop at the
bottom (single thread).
"""
from __future__ import annotations

import hashlib
import time

import numpy as np

# ---- MD5 constants
_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4
    + [6, 10, 15, 21] * 4,
    dtype=np.uint32,
)
_K = np.array(
    [int(abs(np.sin(i + 1)) * 2**32) & 0xFFFFFFFF for i in range(64)],
    dtype=np.uint32,
)
_G_IDX = np.array(
    [i for i in range(16)]
    + [(5 * i + 1) % 16 for i in range(16)]
    + [(3 * i + 5) % 16 for i in range(16)]
    + [(7 * i) % 16 for i in range(16)],
    dtype=np.int64,
)
_INIT = (0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476)


def _compress(state: np.ndarray, M: np.ndarray) -> None:
    """One MD5 block for every lane. state: (4, N) uint32 (mutated);
    M: (16, N) uint32 little-endian words of this block."""
    A = state[0].copy()
    B = state[1].copy()
    C = state[2].copy()
    D = state[3].copy()
    for i in range(64):
        if i < 16:
            F = (B & C) | (~B & D)
        elif i < 32:
            F = (D & B) | (~D & C)
        elif i < 48:
            F = B ^ C ^ D
        else:
            F = C ^ (B | ~D)
        F = F + A + _K[i] + M[_G_IDX[i]]
        A = D
        D = C
        C = B
        s = int(_S[i])
        B = B + ((F << np.uint32(s)) | (F >> np.uint32(32 - s)))
    state[0] += A
    state[1] += B
    state[2] += C
    state[3] += D


# lane-chunk so every per-step temporary stays cache-resident: at
# 16384 lanes a uint32 temp is 64 KB; the whole working set (4 state
# vectors + ~4 step temporaries + the 16-word message block) is ~1.6 MB
_LANE_CHUNK = 16384


def md5_words(data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """MD5 digests of N byte strings → (N, 4) uint32 little-endian
    words (= the digest's 4-byte groups). ``data`` is the flat uint8
    buffer, ``offsets`` (N+1,) int64 row boundaries (Arrow layout)."""
    lens = np.diff(offsets)
    n = len(lens)
    out = np.empty((4, n), dtype=np.uint32)
    # group rows by padded block count: nblocks = (len + 9 + 63) // 64
    nblocks = (lens + 72) // 64
    for nb in np.unique(nblocks):
        sel_all = np.flatnonzero(nblocks == nb)
        width = int(nb) * 64
        cols = np.arange(width)
        for c0 in range(0, len(sel_all), _LANE_CHUNK):
            sel = sel_all[c0 : c0 + _LANE_CHUNK]
            ls = lens[sel]
            g = len(sel)
            # build padded message matrix (g, width)
            pad = np.zeros((g, width), dtype=np.uint8)
            valid = cols[None, :] < ls[:, None]
            src_idx = offsets[sel][:, None] + cols[None, :]
            pad[valid] = data[src_idx[valid]]
            pad[np.arange(g), ls] = 0x80
            bitlen = ls.astype("<u8") * 8
            pad[:, -8:] = np.frombuffer(
                bitlen.tobytes(), dtype=np.uint8
            ).reshape(g, 8)
            state = np.tile(np.array(_INIT, dtype=np.uint32)[:, None], (1, g))
            w = pad.view("<u4").reshape(g, int(nb), 16)
            for b in range(int(nb)):
                _compress(state, np.ascontiguousarray(w[:, b, :].T))
            out[:, sel] = state
    return out.T  # (N, 4) words A,B,C,D little-endian


def md5_halves_60(data: np.ndarray, offsets: np.ndarray):
    """(h1, h2) int64: the two 60-bit halves of the md5 hex digest
    (hex chars 1-15 and 17-31) — the engine's cross-engine convention.

    hex chars 1..15 = high 60 bits of bytes 0..7 read BIG-endian...
    precisely: hex string h[0:16] is bytes 0..7 in order; chars 1-15
    drop the first hex nibble → value = (be64(bytes 0..8) >> 4) minus
    top nibble — easier: chars 1..15 = low 60 bits of the big-endian
    64-bit integer of bytes 0..8's first 16 nibbles... Simplest exact
    construction below from the digest words.
    """
    wrds = md5_words(data, offsets)  # little-endian words
    # digest bytes: each word little-endian. hex = bytes in order.
    # bytes 0..7 come from words 0,1; bytes 8..15 from words 2,3.
    b = np.empty((len(wrds), 16), dtype=np.uint8)
    b[:, 0:4] = wrds[:, 0:1].copy().view(np.uint8).reshape(-1, 4)
    b[:, 4:8] = wrds[:, 1:2].copy().view(np.uint8).reshape(-1, 4)
    b[:, 8:12] = wrds[:, 2:3].copy().view(np.uint8).reshape(-1, 4)
    b[:, 12:16] = wrds[:, 3:4].copy().view(np.uint8).reshape(-1, 4)
    # hex chars 1-15: nibbles 1..15 of bytes 0..7  (nibble 0 = high
    # nibble of byte 0). value = be64(bytes0..7) & ((1<<60)-1)
    be1 = np.zeros(len(wrds), dtype=np.uint64)
    for i in range(8):
        be1 = (be1 << np.uint64(8)) | b[:, i].astype(np.uint64)
    # hex chars 1-15 (1-indexed) = nibbles 0..14 = top 60 bits
    h1 = (be1 >> np.uint64(4)).astype(np.int64)
    be2 = np.zeros(len(wrds), dtype=np.uint64)
    for i in range(8, 16):
        be2 = (be2 << np.uint64(8)) | b[:, i].astype(np.uint64)
    # hex chars 17-31 = nibbles 16..30 = top 60 bits of bytes 8..15
    h2 = (be2 >> np.uint64(4)).astype(np.int64)
    return h1, h2


def _flat(strs: list[bytes]):
    data = np.frombuffer(b"".join(strs), dtype=np.uint8)
    offsets = np.zeros(len(strs) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in strs], out=offsets[1:])
    return data, offsets


def main():
    rng = np.random.default_rng(7)
    # correctness: every length 0..200 plus random lengths
    strs = [bytes(rng.integers(32, 127, size=L, dtype=np.uint8)) for L in range(201)]
    strs += [
        bytes(rng.integers(32, 127, size=int(rng.integers(0, 300)), dtype=np.uint8))
        for _ in range(2000)
    ]
    data, offsets = _flat(strs)
    wrds = md5_words(data, offsets)
    for i, s in enumerate(strs):
        want = hashlib.md5(s).digest()
        got = wrds[i].copy().view(np.uint8).tobytes()
        assert got == want, (i, len(s), got.hex(), want.hex())
    # halves vs the hex-substring convention
    h1, h2 = md5_halves_60(data, offsets)
    for i, s in enumerate(strs[:500]):
        hx = hashlib.md5(s).hexdigest()
        assert h1[i] == int(hx[0:15].lstrip("0") or "0", 16) or h1[i] == int(hx[0:15], 16)
        assert h1[i] == int(hx[0:15], 16), (i, hx, h1[i])
        assert h2[i] == int(hx[16:31], 16), (i, hx, h2[i])
    print("correctness OK:", len(strs), "messages")

    # throughput: 30-40 byte shingle-like strings
    N = 2_000_000
    lens = rng.integers(28, 44, size=N)
    big = rng.integers(97, 123, size=int(lens.sum()), dtype=np.uint8).astype(np.uint8)
    offs = np.zeros(N + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    t0 = time.time()
    md5_words(big, offs)
    t1 = time.time()
    print(f"vectorised: {N/(t1-t0)/1e6:.2f} M hashes/s ({t1-t0:.2f}s for {N})")

    M = 200_000
    views = [big[offs[i]:offs[i+1]].tobytes() for i in range(M)]
    t0 = time.time()
    md5 = hashlib.md5
    res = [md5(v).digest() for v in views]
    t1 = time.time()
    print(f"hashlib loop: {M/(t1-t0)/1e6:.2f} M hashes/s ({t1-t0:.2f}s for {M})")
    assert res[0] == md5_words(big[:offs[M]], offs[:M+1])[0].copy().view(np.uint8).tobytes()


if __name__ == "__main__":
    main()
