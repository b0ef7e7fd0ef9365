"""Golden-byte tests: hand-derived bit patterns for the riskiest bitstream
spots, committed as literals (VERDICT r1 item 5).

The reference's binary fixtures are Git-LFS stubs and no Rust toolchain
exists in this image, so these literals were derived BY HAND from the
documented semantics of the reference's dependencies and code:

- bitstream-io LittleEndian: bits fill each byte LSB-first;
  write_signed(n, v) writes the (n-1) low magnitude bits then the sign bit
  (two's complement), matching enc.rs:312/421 and dec.rs read_signed
  (SURVEY.md Q10).
- huffman.rs:61-99 tree build: stable sort descending by frequency (ties
  keep ascending symbol order), pop the two lowest, merged node inserted
  before the first strictly-smaller entry; left=0/right=1, codes
  accumulate LSB-first (SURVEY.md Q2).

Every expected byte below is computed in comments, not by the library
under test.
"""

import numpy as np


class BitPacker:
    """Minimal LSB-first packer, independent of the library under test."""

    def __init__(self):
        self.bits = []

    def put(self, nbits, value):
        for i in range(nbits):
            self.bits.append((value >> i) & 1)

    def put_signed(self, nbits, value):
        # bitstream-io LE: (nbits-1) low magnitude bits, then sign bit
        self.put(nbits - 1, value & ((1 << (nbits - 1)) - 1))
        self.put(1, 1 if value < 0 else 0)

    def bytes(self):
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i // 8] |= b << (i % 8)
        return bytes(out)


def test_signed_motion_field_bit_layout():
    """P-frame header golden bytes: has_mvec/has_coeff flags + two
    write_signed(7, ...) motion components (enc.rs:418-435).

    Hand derivation for one block, mvx=-3, mvy=5, no coefficients:
      table: all RLE counts are zero -> 16 zero bytes (rle.rs normalize)
      qidx:  (2, 3, 3)
      bits:  1 (has_mvec), 0 (has_coeff),
             -3 & 63 = 61 = 0b111101 LSB-first -> 1,0,1,1,1,1; sign 1
              5       = 0b000101 LSB-first -> 1,0,1,0,0,0; sign 0
      byte0 = [1,0,1,0,1,1,1,1] = 0xF5   byte1 = [1,1,0,1,0,0,0,0] = 0x0B
    """
    from pfv_tpu import runtime

    coeffs = np.zeros((1, 256), dtype=np.int16)
    mvx = np.array([-3], dtype=np.int8)
    mvy = np.array([5], dtype=np.int8)
    hc = np.zeros(1, dtype=np.uint8)
    got = runtime.encode_pframe_payload(coeffs, mvx, mvy, hc, (2, 3, 3))
    want = bytes(16) + bytes([2, 3, 3]) + bytes([0xF5, 0x0B])
    assert got == want, got.hex()

    # and the decoder reads the literal bytes back
    dec, dmx, dmy, dhc, dqi = runtime.decode_pframe_payload(want, 1)
    assert int(dmx[0]) == -3 and int(dmy[0]) == 5 and int(dhc[0]) == 0
    assert tuple(dqi) == (2, 3, 3)


def test_huffman_tie_break_decode_golden():
    """Three equal-frequency symbols: the exact tie-break of huffman.rs
    determines the code of every symbol.

    table[0]=table[1]=table[2]=5. Hand derivation (huffman.rs:61-99):
      sort desc (stable)        -> [s0, s1, s2]
      pop s2,s1 -> m(10), insert before first smaller -> [m(10), s0(5)]
      pop s0,m  -> root(left=s0, right=m); m has left=s2, right=s1
      codes (LSB-first accumulation): s0 = 0 (1 bit),
                                      s2 = 01 (val 1, 2 bits),
                                      s1 = 11 (val 3, 2 bits)
    A payload packed with THOSE literal codes must decode; any deviation
    in tie-breaking garbles every coefficient.
    """
    from pfv_tpu import runtime

    code = {0: (1, 0b0), 1: (2, 0b11), 2: (2, 0b01)}  # (nbits, value)
    p = BitPacker()

    def seq(nz, size, coeff=None):
        p.put(*code[nz])
        p.put(*code[size])
        if size > 0:
            p.put_signed(size, coeff)

    seq(2, 2, 1)    # skip 2, then +1 at slot 2
    seq(1, 1, -1)   # skip 1, then -1 at slot 4 (size 1: sign-only = -1)
    for _ in range(125):
        seq(2, 0)   # 250 zeros
    seq(1, 0)       # 1 zero -> slot 255 consumed

    payload = bytes([5, 5, 5] + [0] * 13) + bytes([0, 1, 1]) + p.bytes()
    coeffs, qidx = runtime.decode_iframe_payload(payload, 1)
    want = np.zeros(256, dtype=np.int16)
    want[2] = 1
    want[4] = -1
    np.testing.assert_array_equal(coeffs[0], want)
    assert tuple(qidx) == (0, 1, 1)


def test_encoder_full_block_golden_bytes():
    """Full I-frame payload, every byte hand-derived: one block with +3 at
    slot 0 and 255 trailing zeros.

    RLE (rle.rs): (nz=0, size=3, +3) then 17 x (15, 0) filler pairs.
    Histogram: counts[0] = 1 + 17 = 18, counts[3] = 1, counts[15] = 17.
    Normalized (x*255/max, min 1): t[0]=255, t[3]=255/18=14, t[15]=240.
    Tree: sort desc -> [s0(255), s15(240), s3(14)]
      pop s3,s15 -> m(254); 254 < 255 -> append -> [s0, m]
      pop m,s0 -> root(left=m, right=s0); m: left=s3, right=s15
      codes: s0 = 1 (1 bit), s3 = 00 (2 bits), s15 = 01 -> val 2 (2 bits)
    Payload bits: code(0)=1; code(3)=0,0; signed(3,+3): mag 11, sign 0;
    then 17 x [code(15)=0,1; code(0)=1].
    """
    from pfv_tpu import runtime

    coeffs = np.zeros((1, 256), dtype=np.int16)
    coeffs[0, 0] = 3

    table = bytearray(16)
    table[0], table[3], table[15] = 255, 14, 240

    p = BitPacker()
    p.put(1, 0b1)        # nz symbol 0
    p.put(2, 0b00)       # size symbol 3
    p.put_signed(3, 3)   # +3
    for _ in range(17):
        p.put(2, 0b10)   # nz symbol 15: bits 0 then 1 -> LSB value 0b10
        p.put(1, 0b1)    # size symbol 0
    want = bytes(table) + bytes([0, 1, 1]) + p.bytes()

    got = runtime.encode_iframe_payload(coeffs, (0, 1, 1))
    assert got == want, (got.hex(), want.hex())

    dec, _ = runtime.decode_iframe_payload(want, 1)
    np.testing.assert_array_equal(dec[0], coeffs[0])
