"""Benchmark: PFV decode-to-RGB throughput on TPU vs single-core scalar baseline.

Mirrors the reference's de-facto benchmark `test_decode_speed_2`
(/root/reference/src/lib.rs:310-335): full decode of a 161-frame 512x384
quality-2 stream (keyframe every 60). The corpus is regenerated
deterministically (the reference's fixtures are Git LFS stubs) and cached.

Baseline: the native single-core scalar decoder (same algorithm as the Rust
reference, compiled -O3 -march=native) on this machine's CPU — the stand-in
for "Rust reference single-core FPS" (no Rust toolchain in this image).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(_REPO, ".bench_cache")
W, H, FPS, QUALITY = 512, 384, 30, 2
N_FRAMES = 161
KEYFRAME_EVERY = 60


def _enable_compile_cache():
    import jax

    cache = os.path.join(_REPO, ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is best-effort
        print(f"[bench] compile cache unavailable: {e}", file=sys.stderr)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_corpus() -> bytes:
    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"corpus_{W}x{H}_q{QUALITY}_{N_FRAMES}f.pfv")
    if os.path.exists(path):
        log(f"[bench] using cached corpus {path}")
        return open(path, "rb").read()

    # Encode in a subprocess: encoding must fetch coefficients from the
    # device, and this tunnel's first device->host fetch permanently degrades
    # the process's dispatch latency — keep that out of the timing process.
    import subprocess

    log("[bench] encoding corpus in subprocess ...")
    rc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--encode-corpus"],
        cwd=_REPO,
    )
    if rc.returncode != 0 or not os.path.exists(path):
        raise RuntimeError("corpus encode subprocess failed")
    return open(path, "rb").read()


def encode_corpus_main() -> None:
    path = os.path.join(CACHE, f"corpus_{W}x{H}_q{QUALITY}_{N_FRAMES}f.pfv")
    _enable_compile_cache()

    from pfv_tpu.encoding import encode_video
    from pfv_tpu.utils.synth import synth_yuv_frame

    log(f"[bench] synthesizing {N_FRAMES} frames {W}x{H} ...")
    t0 = time.time()
    planes = [synth_yuv_frame(t, W, H) for t in range(N_FRAMES)]
    y = np.stack([p[0] for p in planes])
    u = np.stack([p[1] for p in planes])
    v = np.stack([p[2] for p in planes])
    log(f"[bench] synthesized in {time.time()-t0:.1f}s; encoding q{QUALITY} ...")
    t0 = time.time()
    data = encode_video(y, u, v, FPS, QUALITY, KEYFRAME_EVERY)
    dt = time.time() - t0
    log(f"[bench] encoded in {dt:.1f}s ({N_FRAMES/dt:.1f} fps incl. compile) "
        f"-> {len(data)} bytes")
    with open(path, "wb") as f:
        f.write(data)


def bench_baseline(data: bytes, runs: int = 5) -> float:
    """Single-core scalar decode fps (reference stand-in)."""
    from pfv_tpu import runtime

    runtime.ref_decode(data, emit=False)  # warm caches
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        n, *_ = runtime.ref_decode(data, emit=False)
        times.append(time.perf_counter() - t0)
    fps = n / min(times)
    log(f"[bench] scalar single-core baseline: {fps:.1f} fps "
        f"({min(times)*1000:.1f} ms / {n} frames)")
    return fps


def bench_tpu(data: bytes, runs: int = 15) -> float:
    """End-to-end TPU dataloader decode fps: threaded host entropy demux +
    device scan decode to RGB (result left in HBM, as a dataloader would)."""
    import jax

    from pfv_tpu.dataloader import decode_video_rgb

    log(f"[bench] jax devices: {jax.devices()}")
    out = decode_video_rgb(data)  # compile + warm
    jax.block_until_ready(out)
    n = out.shape[0]

    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = decode_video_rgb(data)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    best = min(times)
    med = sorted(times)[len(times) // 2]
    # best-of-N, like the reference's 50-run speed harness; the tunneled
    # single-core host adds heavy run-to-run noise that min filters out
    fps = n / best
    log(f"[bench] TPU decode-to-RGB: {fps:.1f} fps (best {best*1000:.1f} ms, "
        f"median {med*1000:.1f} ms / {n} frames)")
    return fps


def main():
    _enable_compile_cache()
    data = build_corpus()

    base_fps = bench_baseline(data)
    tpu_fps = bench_tpu(data)

    # Correctness: compare position-weighted per-frame plane checksums
    # computed on device vs the scalar decoder. The verdict is cached keyed
    # on (corpus, code) because the tunnel's FIRST device->host fetch costs
    # 1-9 minutes (and degrades later dispatches, so it must follow timing).
    import hashlib

    h = hashlib.sha256(data)
    for root, _, files in os.walk(os.path.join(_REPO, "pfv_tpu")):
        for fn in sorted(files):
            if fn.endswith((".py", ".cpp")):
                h.update(open(os.path.join(root, fn), "rb").read())
    marker = os.path.join(CACHE, f"validated_{h.hexdigest()[:16]}")
    if os.path.exists(marker):
        log("[bench] checksum validation cached: ok")
    else:
        verdict = {}

        def _validate():
            from pfv_tpu import runtime
            from pfv_tpu.dataloader import (
                decode_video_checksums,
                plane_checksums,
            )

            n_ref, ry, ru, rv, _ = runtime.ref_decode(data)
            want = plane_checksums(ry, ru, rv)
            got = decode_video_checksums(data)  # pays the first-D2H wall
            verdict["ok"] = bool(
                n_ref == N_FRAMES
                and got.shape == want.shape
                and (got == want).all()
            )

        t = threading.Thread(target=_validate, daemon=True)
        t.start()
        t.join(timeout=300)
        if "ok" not in verdict:
            log("[bench] checksum validation SKIPPED (tunnel D2H stall; "
                "pixel-exactness is covered by tests/)")
        else:
            log(f"[bench] checksum-exact vs scalar decoder: {verdict['ok']}")
            if not verdict["ok"]:
                print(json.dumps({"metric": "decode_rgb_fps_512x384_q2",
                                  "value": 0.0, "unit": "frames/sec",
                                  "vs_baseline": 0.0,
                                  "error": "checksum mismatch"}))
                sys.exit(1)
            open(marker, "w").write("ok\n")

    print(json.dumps({
        "metric": "decode_rgb_fps_512x384_q2",
        "value": round(tpu_fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(tpu_fps / base_fps, 2),
    }), flush=True)
    # hard-exit: a validation thread stuck in the tunnel's D2H stall would
    # otherwise crash interpreter teardown ("FATAL: exception not rethrown")
    os._exit(0)


if __name__ == "__main__":
    if "--encode-corpus" in sys.argv:
        encode_corpus_main()
        os._exit(0)
    main()
