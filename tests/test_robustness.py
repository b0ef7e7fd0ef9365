"""Robustness: corrupt-input fuzzing of the native demux + determinism.

The reference's resilience surface is header validation + HuffmanError +
the unknown-packet skip (SURVEY.md §5); the rebuild must never crash on
malformed bytes (the C++ layer returns error codes that surface as python
exceptions). Determinism (same input => byte-identical stream across
processes) is the functional analogue of the reference's race-freedom.
"""

import io
import subprocess
import sys

import numpy as np
import pytest

W, H = 64, 48


def _small_clip():
    from pfv_tpu import Encoder, VideoFrame
    from pfv_tpu.utils.synth import synth_yuv_frame

    buf = io.BytesIO()
    enc = Encoder(buf, W, H, 30, 4)
    for t in range(4):
        y, u, v = synth_yuv_frame(t, W, H)
        f = VideoFrame(W, H, y, u, v)
        (enc.encode_iframe if t == 0 else enc.encode_pframe)(f)
    enc.finish()
    return buf.getvalue()


def test_fuzz_bitflips_never_crash():
    """Random single-byte corruptions either decode or raise cleanly."""
    from pfv_tpu import DecodeError, Decoder, runtime

    data = bytearray(_small_clip())
    rng = np.random.default_rng(40)
    outcomes = {"ok": 0, "error": 0}
    for _ in range(200):
        pos = int(rng.integers(0, len(data)))
        old = data[pos]
        data[pos] = int(rng.integers(0, 256))
        blob = bytes(data)
        try:
            n, *_ = runtime.ref_decode(blob, emit=False)
            dec = Decoder(io.BytesIO(blob))
            while dec.advance_frame(lambda f: None):
                pass
            outcomes["ok"] += 1
        except (DecodeError, ValueError, EOFError, AssertionError):
            outcomes["error"] += 1
        finally:
            data[pos] = old
    assert outcomes["ok"] + outcomes["error"] == 200
    assert outcomes["ok"] > 0  # many flips land in coefficients and decode


def test_fuzz_truncations_never_crash():
    from pfv_tpu import DecodeError, Decoder, runtime

    data = _small_clip()
    for cut in range(1, len(data), max(1, len(data) // 60)):
        blob = data[:cut]
        try:
            runtime.ref_decode(blob, emit=False)
        except (ValueError, DecodeError):
            pass
        try:
            dec = Decoder(io.BytesIO(blob))
            while dec.advance_frame(lambda f: None):
                pass
        except (DecodeError, ValueError, EOFError):
            pass


def test_encode_deterministic_across_processes(tmp_path):
    """Byte-identical encode in a fresh interpreter (SURVEY §5: the
    determinism analogue of the reference's race-freedom)."""
    script = tmp_path / "enc_once.py"
    script.write_text(
        """
import io, sys, os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from pfv_tpu import Encoder, VideoFrame
from pfv_tpu.utils.synth import synth_yuv_frame
buf = io.BytesIO()
enc = Encoder(buf, 64, 48, 30, 4)
for t in range(4):
    y, u, v = synth_yuv_frame(t, 64, 48)
    f = VideoFrame(64, 48, y, u, v)
    (enc.encode_iframe if t == 0 else enc.encode_pframe)(f)
enc.finish()
sys.stdout.buffer.write(buf.getvalue())
"""
    )
    import os

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # the script lives in tmp_path, so its dir (not cwd) lands on sys.path
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    outs = []
    for _ in range(2):
        r = subprocess.run(
            [sys.executable, str(script)], capture_output=True, env=env,
            cwd=repo_root,
        )
        assert r.returncode == 0, r.stderr.decode()[-500:]
        outs.append(r.stdout)
    assert outs[0] == outs[1]
    assert outs[0] == _small_clip()  # and identical to this process's encode


def test_degenerate_single_symbol_density():
    """Densest legal stream: a single-symbol Huffman tree has zero-length
    codes, so each (3 zeroes, 3-bit coeff) sequence costs only 3 bits —
    ~8/3 nonzeros per payload byte. The sparse demux buffers must hold it."""
    import struct

    import numpy as np

    from pfv_tpu import runtime
    from pfv_tpu.ops.quant import derive_q_tables

    w, h = 64, 48
    from pfv_tpu.frame import pad16

    yb = (pad16(h) // 16) * (pad16(w) // 16)
    cb = (pad16(h // 2) // 16) * (pad16(w // 2) // 16)
    nb = yb + 2 * cb
    # every block: [0,0,0,2] x 64 -> every RLE sequence is (3, 3, 2):
    # symbol 3 is the only histogram entry -> its code is 0 bits long
    block = np.tile(np.array([0, 0, 0, 2], dtype=np.int16), 64)
    coeffs = np.tile(block, (nb, 1))
    payload = runtime.encode_iframe_payload(coeffs, (0, 1, 1))
    nnz = nb * 64
    assert len(payload) < nnz * 0.5  # truly denser than 4 bits/nonzero

    # payload-level round trip
    dec, _ = runtime.decode_iframe_payload(payload, nb)
    np.testing.assert_array_equal(dec, coeffs)

    # whole-file sparse demux with several such frames
    qt = derive_q_tables(2)
    data = bytearray()
    data += b"PFVIDEO\0"
    data += struct.pack("<IHHHH", 211, w, h, 30, 4)
    for k in ("intra_l", "intra_c", "inter_l", "inter_c"):
        data += qt[k].astype("<u2").tobytes()
    for _ in range(5):
        data += struct.pack("<BI", 1, len(payload)) + payload
    data += struct.pack("<BI", 0, 0)
    data = bytes(data)

    info, idx, val, *_ = runtime.demux_file_sparse(data)
    assert idx.shape[0] == 5 * nnz
    assert (val == 2).all()
    n, ry, *_ = runtime.ref_decode(data)
    assert n == 5


def _container(w, h, packets):
    """Wrap raw (ptype, payload) packets in a minimal PFV container."""
    import struct

    from pfv_tpu.ops.quant import derive_q_tables

    qt = derive_q_tables(2)
    data = bytearray()
    data += b"PFVIDEO\0"
    data += struct.pack("<IHHHH", 211, w, h, 30, 4)
    for k in ("intra_l", "intra_c", "inter_l", "inter_c"):
        data += qt[k].astype("<u2").tobytes()
    for ptype, payload in packets:
        data += struct.pack("<BI", ptype, len(payload)) + payload
    data += struct.pack("<BI", 0, 0)
    return bytes(data)


def test_hostile_max_density_stream():
    """Adversarial density: a frequency table with ONLY symbol 1 nonzero has
    a zero-length code, so each RLE sequence costs 1 bit and emits one
    nonzero — 8 nonzeros/byte, beyond anything the encoder produces. The
    sparse demux must hold them all without overflowing its scratch
    buffers (ADVICE r1, high)."""
    from pfv_tpu import runtime
    from pfv_tpu.frame import pad16

    w, h = 64, 48
    yb = (pad16(h) // 16) * (pad16(w) // 16)
    cb = (pad16(h // 2) // 16) * (pad16(w // 2) // 16)
    nb = yb + 2 * cb
    total = nb * 256

    table = bytes([0, 255] + [0] * 14)  # only symbol 1
    qidx = bytes([0, 1, 1])
    # each sequence: nz=1 (0 bits) + size=1 (0 bits) + 1 sign bit (1 => -1)
    # covers 2 coefficient slots; all-ones payload bits suffice
    nbits = total // 2
    payload = table + qidx + bytes([0xFF]) * ((nbits + 7) // 8)
    data = _container(w, h, [(1, payload)] * 3)

    info, idx, val, *_ = runtime.demux_file_sparse(data)
    assert idx.shape[0] == 3 * (total // 2)  # one emit per 2 slots
    assert (val == -1).all()
    # the dense paths agree and nothing crashes
    n, *_ = runtime.ref_decode(data, emit=False)
    assert n == 3


def test_hostile_zero_progress_stream_rejected():
    """A table with only symbol 0 builds a single-leaf tree whose symbol
    costs no bits; decode would spin forever without the zero-progress
    guard (ADVICE r1, medium)."""
    import pytest

    from pfv_tpu import runtime
    from pfv_tpu.frame import pad16

    w, h = 64, 48
    yb = (pad16(h) // 16) * (pad16(w) // 16)
    cb = (pad16(h // 2) // 16) * (pad16(w // 2) // 16)
    nb = yb + 2 * cb

    payload = bytes([255] + [0] * 15) + bytes([0, 1, 1]) + bytes(8)
    with pytest.raises(ValueError):
        runtime.decode_iframe_payload(payload, nb)
    data = _container(w, h, [(1, payload)])
    with pytest.raises(ValueError):
        runtime.demux_file_sparse(data)
    with pytest.raises(ValueError):
        runtime.ref_decode(data, emit=False)


def test_hostile_oob_motion_vector_rejected():
    """Stream-supplied motion vectors must keep the 16x16 window inside the
    padded plane; the reference panics, we raise (ADVICE r1, medium)."""
    import pytest

    from pfv_tpu import runtime
    from pfv_tpu.frame import pad16

    w, h = 64, 48
    yb = (pad16(h) // 16) * (pad16(w) // 16)
    cb = (pad16(h // 2) // 16) * (pad16(w // 2) // 16)
    nb = yb + 2 * cb

    iframe = runtime.encode_iframe_payload(
        np.zeros((nb, 256), dtype=np.int16), (0, 1, 1)
    )
    mvx = np.zeros(nb, dtype=np.int8)
    mvy = np.zeros(nb, dtype=np.int8)
    mvx[0] = -64  # block 0 sits at the origin: window starts at x=-64
    pframe = runtime.encode_pframe_payload(
        np.zeros((nb, 256), dtype=np.int16), mvx, mvy,
        np.zeros(nb, dtype=np.uint8), (2, 3, 3),
    )
    data = _container(w, h, [(1, iframe), (2, pframe)])

    with pytest.raises(ValueError):
        runtime.ref_decode(data, emit=False)
    with pytest.raises(ValueError):
        runtime.demux_file(data)
    with pytest.raises(ValueError):
        runtime.demux_file_sparse(data)

    from pfv_tpu import DecodeError, Decoder

    dec = Decoder(io.BytesIO(data))
    with pytest.raises(DecodeError):
        while dec.advance_frame(lambda f: None):
            pass


def test_encode_rejects_oversized_coefficients():
    """|coeff| >= 16384 would index past the 16-symbol alphabet; the encode
    entry points must reject instead of corrupting the stack (ADVICE r1, low)."""
    import pytest

    from pfv_tpu import runtime

    bad = np.zeros((4, 256), dtype=np.int16)
    bad[0, 3] = 16384
    with pytest.raises(ValueError):
        runtime.encode_iframe_payload(bad, (0, 1, 1))
    bad[0, 3] = -32768
    with pytest.raises(ValueError):
        runtime.encode_pframe_payload(
            bad, np.zeros(4, np.int8), np.zeros(4, np.int8),
            np.ones(4, np.uint8), (2, 3, 3),
        )
    # the boundary value 16383 (15-bit max) still encodes and round-trips
    ok = np.zeros((4, 256), dtype=np.int16)
    ok[0, 3] = 16383
    ok[1, 7] = -16384 + 1
    p = runtime.encode_iframe_payload(ok, (0, 1, 1))
    dec, _ = runtime.decode_iframe_payload(p, 4)
    np.testing.assert_array_equal(dec, ok)
