"""Independent scalar/numpy model of PFV v2.1.1 for differential testing.

This is a deliberately naive, loop-heavy transcription of the codec's
*specified behavior* (as documented in SURVEY.md from the Rust reference).
It shares no code with the production pfv_tpu path (JAX + C++), so agreement
between the two is strong evidence of correctness — the rebuild's substitute
for the reference's Git-LFS golden fixtures, which are unavailable stubs.

Covers: integer DCT/iDCT, quantization (quirk Q1), macroblock intra/inter
coding, motion search (Q7/Q9), RLE (Q5/Q6), Huffman (Q2), LSB-first bit I/O
(Q10), payload and container mux/demux.
"""

from __future__ import annotations

import struct

import numpy as np

FP_BITS = 8

DCT_SCALE_FACTOR = [
    32, 37, 34, 26, 32, 26, 34, 37, 37, 43, 39, 31, 37, 31, 39, 43,
    34, 39, 35, 28, 34, 28, 35, 39, 26, 31, 28, 22, 26, 22, 28, 31,
    32, 37, 34, 26, 32, 26, 34, 37, 26, 31, 28, 22, 26, 22, 28, 31,
    34, 39, 35, 28, 34, 28, 35, 39, 37, 43, 39, 31, 37, 31, 39, 43,
]

Q_TABLE_INTRA = [
    8, 16, 19, 22, 26, 27, 29, 34, 16, 16, 22, 24, 27, 29, 34, 37,
    19, 22, 26, 27, 29, 34, 34, 38, 22, 22, 26, 27, 29, 34, 37, 40,
    22, 26, 27, 29, 32, 35, 40, 48, 26, 27, 29, 32, 35, 40, 48, 58,
    26, 27, 29, 34, 38, 46, 56, 69, 27, 29, 35, 38, 46, 56, 69, 83,
]

Q_TABLE_INTER = [16] * 64

ZIGZAG_TABLE = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

INV_ZIGZAG_TABLE = [
    0, 1, 5, 6, 14, 15, 27, 28, 2, 4, 7, 13, 16, 26, 29, 42,
    3, 8, 12, 17, 25, 30, 41, 43, 9, 11, 18, 24, 31, 40, 44, 53,
    10, 19, 23, 32, 39, 45, 52, 54, 20, 22, 33, 38, 46, 51, 55, 60,
    21, 34, 37, 47, 50, 56, 59, 61, 35, 36, 48, 49, 57, 58, 62, 63,
]


def tdiv(x: int, d: int) -> int:
    """Rust `/`: truncating signed integer division."""
    q = abs(x) // d
    return -q if x < 0 else q


def wrap_i32(x: int) -> int:
    x &= 0xFFFFFFFF
    return x - 0x100000000 if x >= 0x80000000 else x


def wrap_i16(x: int) -> int:
    x &= 0xFFFF
    return x - 0x10000 if x >= 0x8000 else x


# -- transform ---------------------------------------------------------------


def fdct8(v: list[int]) -> list[int]:
    i0, i1, i2, i3, i4, i5, i6, i7 = v
    a0, a1, a2, a3 = i0 + i7, i1 + i6, i2 + i5, i3 + i4
    a4, a5, a6, a7 = i0 - i7, i1 - i6, i2 - i5, i3 - i4
    b0, b1, b2, b3 = a0 + a3, a1 + a2, a0 - a3, a1 - a2
    c0, c1 = b0 + b1, b0 - b1
    c2 = b2 + tdiv(b2, 4) + tdiv(b3, 2)
    c3 = tdiv(b2, 2) - b3 - tdiv(b3, 4)
    b4 = tdiv(a7, 4) + a4 + tdiv(a4, 4) - tdiv(a4, 16)
    b7 = tdiv(a4, 4) - a7 - tdiv(a7, 4) + tdiv(a7, 16)
    b5 = a5 + a6 - tdiv(a6, 4) - tdiv(a6, 16)
    b6 = a6 - a5 + tdiv(a5, 4) + tdiv(a5, 16)
    c4, c5, c6, c7 = b4 + b5, b4 - b5, b6 + b7, b6 - b7
    d4, d5, d6, d7 = c4, c5 + c7, c5 - c7, c6
    return [wrap_i32(x) for x in [c0, d4, c2, d6, c1, d5, c3, d7]]


def idct8(v: list[int]) -> list[int]:
    c0, d4, c2, d6, c1, d5, c3, d7 = v
    c4, c5, c7, c6 = d4, d5 + d6, d5 - d6, d7
    b4, b5, b6, b7 = c4 + c5, c4 - c5, c6 + c7, c6 - c7
    b0, b1 = c0 + c1, c0 - c1
    b2 = c2 + tdiv(c2, 4) + tdiv(c3, 2)
    b3 = tdiv(c2, 2) - c3 - tdiv(c3, 4)
    a4 = tdiv(b7, 4) + b4 + tdiv(b4, 4) - tdiv(b4, 16)
    a7 = tdiv(b4, 4) - b7 - tdiv(b7, 4) + tdiv(b7, 16)
    a5 = b5 - b6 + tdiv(b6, 4) + tdiv(b6, 16)
    a6 = b6 + b5 - tdiv(b5, 4) - tdiv(b5, 16)
    a0, a1, a2, a3 = b0 + b2, b1 + b3, b1 - b3, b0 - b2
    return [
        wrap_i32(x)
        for x in [a0 + a4, a1 + a5, a2 + a6, a3 + a7, a3 - a7, a2 - a6, a1 - a5, a0 - a4]
    ]


def fdct2d(m: list[int]) -> list[int]:
    m = list(m)
    for r in range(8):
        m[r * 8 : r * 8 + 8] = fdct8(m[r * 8 : r * 8 + 8])
    for c in range(8):
        col = idx_col(m, c)
        col = fdct8(col)
        set_col(m, c, col)
    return m


def idct2d(m: list[int]) -> list[int]:
    m = list(m)
    for c in range(8):
        set_col(m, c, idct8(idx_col(m, c)))
    for r in range(8):
        m[r * 8 : r * 8 + 8] = idct8(m[r * 8 : r * 8 + 8])
    return m


def idx_col(m, c):
    return [m[c + 8 * r] for r in range(8)]


def set_col(m, c, col):
    for r in range(8):
        m[c + 8 * r] = col[r]


# -- quantization (quirk Q1) ---------------------------------------------------


def quantize(m: list[int], q_table: list[int]) -> list[int]:
    out = [0] * 64
    for i, idx in enumerate(ZIGZAG_TABLE):
        n = wrap_i32(m[idx] * DCT_SCALE_FACTOR[idx]) >> (FP_BITS * 2)
        out[i] = wrap_i16(tdiv(n, q_table[idx]))
    return out


def dequantize(zz: list[int], q_table: list[int]) -> list[int]:
    out = [0] * 64
    for i, idx in enumerate(INV_ZIGZAG_TABLE):
        n = wrap_i32(zz[idx] * DCT_SCALE_FACTOR[idx])
        out[i] = wrap_i32(n * q_table[idx])
    return out


# -- subblock / macroblock codec -----------------------------------------------


def encode_subblock(px64: list[int], q_table: list[int]) -> list[int]:
    m = [(p - 128) << FP_BITS for p in px64]
    return quantize(fdct2d(m), q_table)


def encode_subblock_delta(d64: list[int], q_table: list[int]) -> list[int]:
    m = [tdiv(d, 2) << FP_BITS for d in d64]
    return quantize(fdct2d(m), q_table)


def decode_subblock(zz64: list[int], q_table: list[int]) -> list[int]:
    m = idct2d(dequantize(zz64, q_table))
    return [min(255, max(0, (x >> FP_BITS) + 128)) for x in m]


def split_subblocks(block16: np.ndarray) -> list[list[int]]:
    """(16,16) -> 4 row-major 64-lists in [TL, TR, BL, BR] order."""
    subs = []
    for dy, dx in ((0, 0), (0, 8), (8, 0), (8, 8)):
        subs.append([int(v) for v in block16[dy : dy + 8, dx : dx + 8].reshape(-1)])
    return subs


def join_subblocks(subs: list[list[int]]) -> np.ndarray:
    out = np.zeros((16, 16), dtype=np.int64)
    for (dy, dx), s in zip(((0, 0), (0, 8), (8, 0), (8, 8)), subs):
        out[dy : dy + 8, dx : dx + 8] = np.array(s).reshape(8, 8)
    return out


def encode_block(block16: np.ndarray, q_table: list[int]) -> list[int]:
    """(16,16) u8 -> 256 zigzag coeffs."""
    out = []
    for s in split_subblocks(block16):
        out.extend(encode_subblock(s, q_table))
    return out


def decode_block(coeffs256: list[int], q_table: list[int]) -> np.ndarray:
    subs = [decode_subblock(coeffs256[i * 64 : (i + 1) * 64], q_table) for i in range(4)]
    return join_subblocks(subs).astype(np.uint8)


# -- plane helpers ----------------------------------------------------------------


def pad16(x: int) -> int:
    return x + (16 - x % 16) % 16


def pad_plane(plane: np.ndarray, clear: int) -> np.ndarray:
    h, w = plane.shape
    out = np.full((pad16(h), pad16(w)), clear, dtype=np.uint8)
    out[:h, :w] = plane
    return out


def encode_plane(plane: np.ndarray, q_table: list[int], clear: int) -> list[list[int]]:
    """-> per-block 256-coeff lists in raster order (common.rs:351-386)."""
    p = pad_plane(plane, clear)
    h, w = p.shape
    blocks = []
    for by in range(h // 16):
        for bx in range(w // 16):
            blocks.append(encode_block(p[by * 16 : by * 16 + 16, bx * 16 : bx * 16 + 16], q_table))
    return blocks


def decode_plane(blocks: list[list[int]], q_table: list[int], h: int, w: int) -> np.ndarray:
    out = np.zeros((h, w), dtype=np.uint8)
    bw = w // 16
    for i, coeffs in enumerate(blocks):
        by, bx = divmod(i, bw)
        out[by * 16 : by * 16 + 16, bx * 16 : bx * 16 + 16] = decode_block(coeffs, q_table)
    return out


# -- motion (common.rs:125-236) ----------------------------------------------------


def calc_error(a: np.ndarray, b: np.ndarray) -> int:
    d = a.astype(np.int64) - b.astype(np.int64)
    return int((d * d).sum())


def block_search(src: np.ndarray, ref: np.ndarray, cx: int, cy: int, step: int):
    h, w = ref.shape
    best_dx = best_dy = 0
    best_slice = ref[cy : cy + 16, cx : cx + 16]
    best_err = calc_error(src, best_slice)
    for my in (-1, 0, 1):
        oy = cy + my * step
        if oy < 0 or oy > h - 16:
            continue
        for mx in (-1, 0, 1):
            if my == 0 and mx == 0:
                continue
            ox = cx + mx * step
            if ox < 0 or ox > w - 16:
                continue
            sl = ref[oy : oy + 16, ox : ox + 16]
            err = calc_error(src, sl)
            if err < best_err:
                best_slice, best_err, best_dx, best_dy = sl, err, mx * step, my * step
    if step > 1:
        dx2, dy2, err2, sl2 = block_search(src, ref, cx + best_dx, cy + best_dy, step // 2)
        return best_dx + dx2, best_dy + dy2, err2, sl2
    return best_dx, best_dy, best_err, best_slice


def encode_block_delta(src: np.ndarray, ref: np.ndarray, bx: int, by: int,
                       q_table: list[int], px_err: float):
    """-> (mvx, mvy, coeffs256 | None)."""
    min_err = np.float32(px_err) * np.float32(px_err) * np.float32(256.0)
    dx, dy, err, pred = block_search(src, ref, bx, by, 8)
    if np.float32(err) <= min_err:
        return dx, dy, None
    delta = np.clip(src.astype(np.int64) - pred.astype(np.int64), -255, 255)
    out = []
    for dy8, dx8 in ((0, 0), (0, 8), (8, 0), (8, 8)):
        d64 = [int(v) for v in delta[dy8 : dy8 + 8, dx8 : dx8 + 8].reshape(-1)]
        out.extend(encode_subblock_delta(d64, q_table))
    return dx, dy, out


def decode_block_delta(coeffs256, mvx, mvy, ref, bx, by, q_table):
    pred = ref[by + mvy : by + mvy + 16, bx + mvx : bx + mvx + 16]
    if coeffs256 is None:
        return pred.copy()
    res = decode_block(coeffs256, q_table).astype(np.int64)
    out = pred.astype(np.int64) + (res - 128) * 2
    return np.clip(out, 0, 255).astype(np.uint8)


# -- entropy: RLE + Huffman + bit I/O (rle.rs, huffman.rs) ---------------------------


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, nbits: int, val: int):
        self.acc |= (val & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.bytes.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def write_bit(self, b: bool):
        self.write(1, 1 if b else 0)

    def write_signed(self, nbits: int, val: int):
        self.write(nbits - 1, val & ((1 << (nbits - 1)) - 1))
        self.write_bit(val < 0)

    def byte_align(self):
        if self.n > 0:
            self.bytes.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0


class BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.total = len(data) * 8

    def read(self, nbits: int) -> int:
        v = 0
        for i in range(nbits):
            byte = self.data[(self.pos + i) >> 3]
            v |= ((byte >> ((self.pos + i) & 7)) & 1) << i
        self.pos += nbits
        return v

    def peek(self, nbits: int) -> int:
        p = self.pos
        v = 0
        for i in range(nbits):
            idx = (p + i) >> 3
            bit = (self.data[idx] >> ((p + i) & 7)) & 1 if idx < len(self.data) else 0
            v |= bit << i
        return v

    def read_bit(self) -> bool:
        return self.read(1) != 0

    def read_signed(self, nbits: int) -> int:
        u = self.read(nbits - 1)
        return u - (1 << (nbits - 1)) if self.read_bit() else u


def rle_encode(data: list[int]) -> list[tuple[int, int, int]]:
    """-> [(num_zeroes, coeff_size, coeff)] (rle.rs:9-39)."""
    out = []
    run = 0
    for v in data:
        if v == 0:
            run += 1
        else:
            while run > 15:
                out.append((15, 0, 0))
                run -= 15
            c = abs(v)
            numbits = (16 - (16 - c.bit_length())) + 1  # 16 - clz16(c) + 1
            out.append((run, numbits, v))
            run = 0
    while run > 15:
        out.append((15, 0, 0))
        run -= 15
    if run > 0:
        out.append((run, 0, 0))
    return out


def normalize_table(counts: list[int]) -> list[int]:
    mx = max(counts)
    return [max(1, x * 255 // mx) if x > 0 else 0 for x in counts]


class Node:
    __slots__ = ("freq", "ch", "left", "right")

    def __init__(self, freq, ch=None, left=None, right=None):
        self.freq, self.ch, self.left, self.right = freq, ch, left, right


def huffman_from_table(table: list[int]):
    """-> (codes: {sym: (val, len)}, root Node | None), quirk Q2 semantics."""
    p = [Node(f, ch) for ch, f in enumerate(table) if f > 0]
    p.sort(key=lambda n: -n.freq)  # python sort is stable
    while len(p) > 1:
        a = p.pop()
        b = p.pop()
        c = Node(a.freq + b.freq, None, a, b)
        ins = len(p)
        for i, n in enumerate(p):
            if c.freq > n.freq:
                ins = i
                break
        p.insert(ins, c)
    codes: dict[int, tuple[int, int]] = {}
    if not p:
        return codes, None

    def assign(node, val, length):
        if node.ch is not None:
            codes[node.ch] = (val, length)
            return
        if node.left is not None:
            assign(node.left, val, length + 1)
        if node.right is not None:
            assign(node.right, val | (1 << length), length + 1)

    assign(p[0], 0, 0)
    return codes, p[0]


def huffman_read(root, br: BitReader) -> int:
    node = root
    while node.ch is None:
        node = node.right if br.read_bit() else node.left
    return node.ch


# -- payload mux/demux (enc.rs:237-481, dec.rs:226-448) -------------------------------


def encode_iframe_payload(block_coeffs: list[list[int]], qidx) -> bytes:
    seqs = [rle_encode(bc) for bc in block_coeffs]
    counts = [0] * 16
    for s in seqs:
        for nz, cs, _ in s:
            counts[nz] += 1
            counts[cs] += 1
    table = normalize_table(counts)
    codes, _ = huffman_from_table(table)
    bw = BitWriter()
    for t in table:
        bw.write(8, t)
    for qi in qidx:
        bw.write(8, qi)
    for s in seqs:
        for nz, cs, coeff in s:
            bw.write(codes[nz][1], codes[nz][0])
            bw.write(codes[cs][1], codes[cs][0])
            if cs > 0:
                bw.write_signed(cs, coeff)
    bw.byte_align()
    return bytes(bw.bytes)


def decode_coeff_stream(root, br: BitReader, total: int) -> list[int]:
    out = [0] * total
    idx = 0
    while idx < total:
        idx += huffman_read(root, br)
        nbits = huffman_read(root, br)
        if nbits > 0:
            out[idx] = br.read_signed(nbits)
            idx += 1
    return out


def decode_iframe_payload(payload: bytes, total_blocks: int):
    br = BitReader(payload)
    table = [br.read(8) for _ in range(16)]
    _, root = huffman_from_table(table)
    qidx = [br.read(8) for _ in range(3)]
    coeffs = decode_coeff_stream(root, br, total_blocks * 256)
    return coeffs, qidx


def encode_pframe_payload(blocks: list[tuple[int, int, list[int] | None]], qidx) -> bytes:
    """blocks: [(mvx, mvy, coeffs256|None)] in Y,U,V raster order."""
    seqs = []
    counts = [0] * 16
    for _, _, bc in blocks:
        if bc is None:
            continue
        s = rle_encode(bc)
        seqs.append(s)
        for nz, cs, _ in s:
            counts[nz] += 1
            counts[cs] += 1
    table = normalize_table(counts)
    codes, _ = huffman_from_table(table)
    bw = BitWriter()
    for t in table:
        bw.write(8, t)
    for qi in qidx:
        bw.write(8, qi)
    for mvx, mvy, bc in blocks:
        has_mvec = mvx != 0 or mvy != 0
        bw.write_bit(has_mvec)
        bw.write_bit(bc is not None)
        if has_mvec:
            bw.write_signed(7, mvx)
            bw.write_signed(7, mvy)
    for s in seqs:
        for nz, cs, coeff in s:
            bw.write(codes[nz][1], codes[nz][0])
            bw.write(codes[cs][1], codes[cs][0])
            if cs > 0:
                bw.write_signed(cs, coeff)
    bw.byte_align()
    return bytes(bw.bytes)


def decode_pframe_payload(payload: bytes, total_blocks: int):
    br = BitReader(payload)
    table = [br.read(8) for _ in range(16)]
    _, root = huffman_from_table(table)
    qidx = [br.read(8) for _ in range(3)]
    headers = []
    for _ in range(total_blocks):
        has_mvec = br.read_bit()
        has_coeff = br.read_bit()
        mvx = mvy = 0
        if has_mvec:
            mvx = br.read_signed(7)
            mvy = br.read_signed(7)
        headers.append((mvx, mvy, has_coeff))
    coeffs = []
    for mvx, mvy, hc in headers:
        coeffs.append(decode_coeff_stream(root, br, 256) if hc else [0] * 256)
    return headers, coeffs, qidx


# -- whole-file oracle codec -----------------------------------------------------------


def derive_q_tables(quality: int) -> dict[str, list[int]]:
    qscale = np.float32(quality) * np.float32(0.25)

    def derive(base, lum):
        out = []
        for x in base:
            v = np.float32(x) * qscale
            if lum:
                v = v * np.float32(0.5)
            out.append(int(max(v, np.float32(1.0))))
        return out

    return {
        "intra_l": derive(Q_TABLE_INTRA, True),
        "intra_c": derive(Q_TABLE_INTRA, False),
        "inter_l": derive(Q_TABLE_INTER, True),
        "inter_c": derive(Q_TABLE_INTER, False),
    }


class OracleEncoder:
    """File-level oracle encoder mirroring pfv_rs::enc::Encoder."""

    def __init__(self, width, height, framerate, quality):
        self.width, self.height, self.framerate = width, height, framerate
        self.quality = quality
        self.px_err = float(np.float32(quality) * np.float32(1.5))
        self.qt = derive_q_tables(quality)
        self.out = bytearray()
        self.out += b"PFVIDEO\0"
        self.out += struct.pack("<IHHHH", 211, width, height, framerate, 4)
        for k in ("intra_l", "intra_c", "inter_l", "inter_c"):
            self.out += np.array(self.qt[k], dtype="<u2").tobytes()
        self.prev = {
            "y": np.zeros((pad16(height), pad16(width)), np.uint8),
            "u": np.full((pad16(height // 2), pad16(width // 2)), 128, np.uint8),
            "v": np.full((pad16(height // 2), pad16(width // 2)), 128, np.uint8),
        }

    def _packet(self, ptype: int, payload: bytes):
        self.out += struct.pack("<BI", ptype, len(payload))
        self.out += payload

    def encode_iframe(self, y, u, v):
        all_blocks = []
        for name, plane, qk, clear in (
            ("y", y, "intra_l", 0), ("u", u, "intra_c", 128), ("v", v, "intra_c", 128)
        ):
            blocks = encode_plane(plane, self.qt[qk], clear)
            ph, pw = self.prev[name].shape
            self.prev[name] = decode_plane(blocks, self.qt[qk], ph, pw)
            all_blocks.extend(blocks)
        self._packet(1, encode_iframe_payload(all_blocks, (0, 1, 1)))

    def encode_pframe(self, y, u, v):
        all_blocks = []
        new_prev = {}
        for name, plane, qk, clear in (
            ("y", y, "inter_l", 0), ("u", u, "inter_c", 128), ("v", v, "inter_c", 128)
        ):
            ref = self.prev[name]
            p = pad_plane(plane, clear)
            h, w = p.shape
            recon = np.zeros_like(ref)
            for byi in range(h // 16):
                for bxi in range(w // 16):
                    src = p[byi * 16 : byi * 16 + 16, bxi * 16 : bxi * 16 + 16]
                    mvx, mvy, coeffs = encode_block_delta(
                        src, ref, bxi * 16, byi * 16, self.qt[qk], self.px_err
                    )
                    all_blocks.append((mvx, mvy, coeffs))
                    recon[byi * 16 : byi * 16 + 16, bxi * 16 : bxi * 16 + 16] = (
                        decode_block_delta(coeffs, mvx, mvy, ref, bxi * 16, byi * 16, self.qt[qk])
                    )
            new_prev[name] = recon
        self.prev.update(new_prev)
        self._packet(2, encode_pframe_payload(all_blocks, (2, 3, 3)))

    def encode_dropframe(self):
        self._packet(1, b"")

    def finish(self) -> bytes:
        self._packet(0, b"")
        return bytes(self.out)


class OracleDecoder:
    """File-level oracle decoder mirroring pfv_rs::dec::Decoder."""

    def __init__(self, data: bytes):
        assert data[:8] == b"PFVIDEO\0"
        version, w, h, fps, nq = struct.unpack("<IHHHH", data[8:20])
        assert version == 211
        self.width, self.height, self.framerate = w, h, fps
        off = 20
        self.qtables = []
        for _ in range(nq):
            self.qtables.append(
                [int(x) for x in np.frombuffer(data[off : off + 128], dtype="<u2")]
            )
            off += 128
        self.data = data
        self.off = off
        self.fb = {
            "y": np.zeros((pad16(h), pad16(w)), np.uint8),
            "u": np.full((pad16(h // 2), pad16(w // 2)), 128, np.uint8),
            "v": np.full((pad16(h // 2), pad16(w // 2)), 128, np.uint8),
        }

    def decode_all(self) -> list[tuple[np.ndarray, np.ndarray, np.ndarray]]:
        frames = []
        w, h = self.width, self.height
        yb = (pad16(h) // 16) * (pad16(w) // 16)
        cb = (pad16(h // 2) // 16) * (pad16(w // 2) // 16)
        total = yb + 2 * cb
        while True:
            ptype = self.data[self.off]
            (plen,) = struct.unpack("<I", self.data[self.off + 1 : self.off + 5])
            payload = self.data[self.off + 5 : self.off + 5 + plen]
            self.off += 5 + plen
            if ptype == 0:
                break
            if ptype == 1 and plen > 0:
                coeffs, qidx = decode_iframe_payload(payload, total)
                for name, sl, qi in (
                    ("y", slice(0, yb * 256), qidx[0]),
                    ("u", slice(yb * 256, (yb + cb) * 256), qidx[1]),
                    ("v", slice((yb + cb) * 256, None), qidx[2]),
                ):
                    c = coeffs[sl]
                    ph, pw = self.fb[name].shape
                    blocks = [c[i * 256 : (i + 1) * 256] for i in range(len(c) // 256)]
                    self.fb[name] = decode_plane(blocks, self.qtables[qi], ph, pw)
            elif ptype == 2:
                headers, coeffs, qidx = decode_pframe_payload(payload, total)
                ofs = 0
                for name, nb, qi in (("y", yb, qidx[0]), ("u", cb, qidx[1]), ("v", cb, qidx[2])):
                    ref = self.fb[name]
                    ph, pw = ref.shape
                    out = np.zeros_like(ref)
                    for i in range(nb):
                        mvx, mvy, hc = headers[ofs + i]
                        byi, bxi = divmod(i, pw // 16)
                        out[byi * 16 : byi * 16 + 16, bxi * 16 : bxi * 16 + 16] = (
                            decode_block_delta(
                                coeffs[ofs + i] if hc else None,
                                mvx, mvy, ref, bxi * 16, byi * 16, self.qtables[qi],
                            )
                        )
                    self.fb[name] = out
                    ofs += nb
            elif ptype == 1:
                continue  # drop frame: no emit
            else:
                continue  # unknown: skip
            frames.append(
                (
                    self.fb["y"][:h, :w].copy(),
                    self.fb["u"][: h // 2, : w // 2].copy(),
                    self.fb["v"][: h // 2, : w // 2].copy(),
                )
            )
        return frames
