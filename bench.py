"""Benchmark: PFV decode-to-RGB throughput on TPU vs single-core scalar baseline.

Primary metric: SUSTAINED 1080p decode-to-RGB frames/sec/chip with forced
completion, dataloader mode — host entropy demux + one fused device program,
frames left in HBM. Sustained = a two-point (N=1 vs N=9 clips, fresh
subprocess each) difference that includes device execution; the async host
dispatch rate that earlier rounds reported as the headline is kept in
extras as host_pipeline_fps (block_until_ready returns before execution
completes on this backend, so that rate overstates throughput whenever
device time exceeds host time). Also reported: the dense-texture 1080p pan
worst case, the reference's own de-facto benchmark workload (161-frame
512x384 q2, lib.rs:310-335), per-stage decode timings (demux MB/s, H2D),
steady-state encode fps with its stage split, and a Pallas-vs-XLA A/B.

Baseline: the native single-core scalar decoder (same algorithm as the Rust
reference, compiled -O3 -march=native) on this machine's CPU — the stand-in
for "Rust reference single-core FPS" (no Rust toolchain in this image).

Corpora are regenerated deterministically (the reference's fixtures are Git
LFS pointer stubs) and cached under .bench_cache/. Encoding runs in a
subprocess because it must fetch coefficients from the device, and this
tunnel's first device->host fetch permanently degrades the fetching
process's dispatch latency — it must never share a process with the timing.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(_REPO, ".bench_cache")

CONFIGS = {
    # 120 frames = 2 GOPs at keyframe/60 — comparable in length to the
    # reference's own 161-frame speed-test workload (lib.rs:310-335)
    "1080p": dict(W=1920, H=1080, F=120, Q=2, KEY=60, GEN="std"),
    "1080p_pan": dict(W=1920, H=1080, F=120, Q=2, KEY=60, GEN="pan"),
    "sd": dict(W=512, H=384, F=161, Q=2, KEY=60, GEN="std"),
}
PRIMARY = "1080p"
WORST = "1080p_pan"
FPS_HDR = 30


def _corpus_path(name: str) -> str:
    c = CONFIGS[name]
    gen = "" if c["GEN"] == "std" else f"_{c['GEN']}"
    return os.path.join(
        CACHE, f"corpus_{c['W']}x{c['H']}_q{c['Q']}_{c['F']}f{gen}.pfv"
    )


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _enable_compile_cache():
    from pfv_tpu import config

    config.enable_compile_cache(os.path.join(_REPO, ".jax_cache"))


def build_corpus(name: str) -> bytes:
    os.makedirs(CACHE, exist_ok=True)
    path = _corpus_path(name)
    if os.path.exists(path):
        log(f"[bench] using cached corpus {path}")
        return open(path, "rb").read()

    log(f"[bench] encoding {name} corpus (chunk subprocesses) ...")
    encode_corpus_main(name)  # spawns one subprocess per GOP chunk
    if not os.path.exists(path):
        raise RuntimeError(f"corpus encode failed ({name})")
    return open(path, "rb").read()


def _synth_planes(name: str, a: int, b: int):
    c = CONFIGS[name]
    if c["GEN"] == "pan":
        from pfv_tpu.utils.synth import synth_pan_clip

        return synth_pan_clip(b - a, c["W"], c["H"], t0=a)
    from pfv_tpu.utils.synth import synth_yuv_frame

    planes = [synth_yuv_frame(t, c["W"], c["H"]) for t in range(a, b)]
    return (
        np.stack([p[0] for p in planes]),
        np.stack([p[1] for p in planes]),
        np.stack([p[2] for p in planes]),
    )


def encode_chunk_main(name: str, a: int, b: int, part_path: str) -> None:
    """Subprocess: synthesize + encode frames [a, b) of a corpus as one
    standalone GOP-aligned container, and record the steady-state encode
    fps + stage split of a second timed encode. One chunk per process:
    this tunnel's first device->host fetch permanently degrades the
    fetching process's dispatch latency, so chunks must not share one."""
    c = CONFIGS[name]
    _enable_compile_cache()

    from pfv_tpu.encoding import encode_video
    from pfv_tpu.utils.profiling import StageTimer

    log(f"[bench] chunk {name}[{a}:{b}]: synthesizing ...")
    t0 = time.time()
    y, u, v = _synth_planes(name, a, b)
    log(f"[bench] chunk synthesized in {time.time()-t0:.1f}s; encoding ...")
    t0 = time.time()
    data = encode_video(y, u, v, FPS_HDR, c["Q"], c["KEY"])
    dt = time.time() - t0
    log(f"[bench] chunk encoded in {dt:.1f}s (incl. compile + first-fetch "
        f"wall) -> {len(data)} bytes")
    timer = StageTimer()
    t0 = time.time()
    data2 = encode_video(y, u, v, FPS_HDR, c["Q"], c["KEY"], timer=timer)
    dt2 = time.time() - t0
    assert data2 == data, "encode nondeterminism"
    log(f"[bench] chunk steady-state encode: {(b-a)/dt2:.1f} fps ({dt2:.2f}s)")
    log(timer.report())
    with open(part_path + ".stats.json", "w") as fh:
        json.dump({
            "frames": b - a,
            "secs": dt2,
            "stages_ms": {k: round(t * 1000, 1)
                          for k, t in timer.totals.items()},
        }, fh)
    with open(part_path, "wb") as f:
        f.write(data)


def encode_corpus_main(name: str) -> None:
    """Encode a corpus in GOP-aligned chunks, one fresh subprocess each
    (isolates the tunnel's first-D2H degradation and the TPU worker's
    instability on very long whole-clip encode programs), then splice the
    packet streams — byte-identical to a whole-clip encode because GOPs
    are self-contained."""
    c = CONFIGS[name]
    path = _corpus_path(name)

    parts, stats = [], []
    hdr_end = 20 + 4 * 128  # magic + u32 + 4*u16 + 4 q-tables
    for a in range(0, c["F"], c["KEY"]):
        b = min(a + c["KEY"], c["F"])
        part = f"{path}.part{a}"
        rc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--encode-chunk",
             name, str(a), str(b), part],
            cwd=_REPO,
        )
        if rc.returncode != 0 or not os.path.exists(part):
            raise RuntimeError(f"chunk encode failed ({name}[{a}:{b}])")
        blob = open(part, "rb").read()
        parts.append(blob[:-5] if not parts else blob[hdr_end:-5])
        stats.append(json.load(open(part + ".stats.json")))
        os.remove(part)
        os.remove(part + ".stats.json")
    data = b"".join(parts) + bytes(5)  # one EOF packet

    total_f = sum(s["frames"] for s in stats)
    total_s = sum(s["secs"] for s in stats)
    merged: dict = {}
    for s in stats:
        for k, v in s["stages_ms"].items():
            merged[k] = round(merged.get(k, 0.0) + v, 1)
    with open(path + ".encstats.json", "w") as fh:
        json.dump({
            "encode_fps": round(total_f / total_s, 2),
            "stages_ms": merged,
            "bytes": len(data),
        }, fh)
    with open(path, "wb") as f:
        f.write(data)
    log(f"[bench] {name}: spliced {len(stats)} chunk(s), "
        f"{len(data)} bytes, steady-state {total_f/total_s:.1f} fps")


def bench_baseline(data: bytes, tag: str, runs: int = 5) -> float:
    """Single-core scalar decode fps (reference stand-in).

    Emits every frame into preallocated buffers, matching the reference's
    speed harness (decode + blit to retframe + callback per frame,
    lib.rs:310-335)."""
    from pfv_tpu import runtime

    info, _ = runtime.parse_header(data)
    w, h = info["width"], info["height"]
    n0, *_ = runtime.ref_decode(data, emit=False)  # frame count + warm
    y = np.empty((n0, h, w), dtype=np.uint8)
    u = np.empty((n0, h // 2, w // 2), dtype=np.uint8)
    v = np.empty_like(u)
    runtime.ref_decode_into(data, y, u, v)  # touch pages
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        n = runtime.ref_decode_into(data, y, u, v)
        times.append(time.perf_counter() - t0)
    fps = n / min(times)
    log(f"[bench] {tag} scalar single-core baseline: {fps:.1f} fps "
        f"({min(times)*1000:.1f} ms / {n} frames)")
    return fps


def bench_tpu_host_rate(data: bytes, tag: str, runs: int = 15) -> float:
    """Host-side pipeline rate: demux + upload + dispatch per clip, device
    execution left ASYNC (block_until_ready returns before execution
    completes on this backend). This is the rate at which one host core
    can feed clips to the chip — NOT sustained decode throughput; see
    bench_tpu_sustained for that."""
    import jax

    from pfv_tpu.dataloader import decode_video_rgb

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
    fps = n / best
    log(f"[bench] {tag} host pipeline rate: {fps:.1f} fps "
        f"(best {best*1000:.1f} ms, median {med*1000:.1f} ms / {n} frames)")
    return fps


def sustained_main(name: str, reps: int) -> None:
    """Subprocess: decode the corpus `reps` times end-to-end, then force
    completion with a single tiny device->host fetch (the only reliable
    sync on this backend — block_until_ready returns early). Prints total
    seconds. Fresh process per N so the constant first-fetch wall cancels
    in the caller's two-point difference."""
    _enable_compile_cache()
    import jax

    from pfv_tpu.dataloader import decode_video_rgb

    data = open(_corpus_path(name), "rb").read()
    out = decode_video_rgb(data)
    _ = np.asarray(out[0, 0, 0])  # warm: compile + first-fetch wall
    t0 = time.perf_counter()
    for _ in range(reps):
        out = decode_video_rgb(data)
    _ = np.asarray(out[0, 0, 0, 0]) if out.ndim == 4 else np.asarray(out)
    total = time.perf_counter() - t0
    print(json.dumps({"reps": reps, "secs": round(total, 3),
                      "frames": int(out.shape[0])}), flush=True)
    os._exit(0)


def bench_tpu_sustained(tag: str) -> dict:
    """True sustained decode throughput: run N clips back-to-back and
    force completion, in fresh subprocesses for N=1 and N=9; the per-clip
    time is the two-point difference (cancels compile, warmup, and the
    per-process first-fetch wall). This bounds throughput by whichever of
    host pipeline and device execution is slower — the honest number."""
    def point(reps: int):
        # two trials per point, take min: the per-process first-fetch wall
        # varies by seconds run-to-run and only its MINIMUM behaves like
        # the constant the two-point difference cancels
        best = None
        for _ in range(2):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--sustained",
                 tag, str(reps)],
                cwd=_REPO, capture_output=True, text=True, timeout=1800,
            )
            if r.returncode != 0:
                log(f"[bench] sustained({tag}, {reps}) failed: "
                    f"{r.stderr[-300:]}")
                return None
            cur = json.loads(r.stdout.strip().splitlines()[-1])
            if best is None or cur["secs"] < best["secs"]:
                best = cur
        return best

    p1 = point(1)
    p9 = point(9)
    if p1 is None or p9 is None:
        return {}
    est = max((p9["secs"] - p1["secs"]) / 8, 1e-3)
    n2, pn = 9, p9
    if 8 * est < 3.0:
        # short clips: stretch the second point until the signal (~4 s)
        # dominates residual wall noise
        n2 = 1 + min(int(4.0 / est) + 1, 96)
        pn = point(n2)
        if pn is None:
            return {}
    per_clip = (pn["secs"] - p1["secs"]) / (n2 - 1)
    frames = p1["frames"]
    fps = frames / per_clip
    log(f"[bench] {tag} SUSTAINED decode-to-RGB: {fps:.1f} fps "
        f"({per_clip*1000:.1f} ms / {frames} frames, forced completion)")
    return {"fps": round(fps, 1), "ms_per_clip": round(per_clip * 1000, 1),
            "frames": frames}


def bench_stages(data: bytes, tag: str, runs: int = 10) -> dict:
    """Per-stage decode timings: host demux (MB/s), H2D upload, device-only.

    Device-only is timed on device-resident inputs (dispatch + execution to
    block_until_ready), isolating it from host demux/upload."""
    import jax
    import jax.numpy as jnp

    from pfv_tpu import runtime
    from pfv_tpu.dataloader import _NNZ_BUCKET

    # --- demux only ---
    best_demux = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        info, deltas, vals, bh, ftype, qidx = runtime.demux_file_sparse_packed(
            data, 0, pad_to_multiple=_NNZ_BUCKET
        )
        best_demux = min(best_demux, time.perf_counter() - t0)
    mbps = len(data) / best_demux / 1e6
    n_frames = int(ftype.shape[0])

    meta = np.concatenate([bh.view(np.uint8).ravel(), ftype, qidx.ravel()])
    h2d_bytes = deltas.nbytes + vals.nbytes + meta.nbytes

    # --- H2D upload only ---
    best_h2d = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        args = (jnp.asarray(deltas), jnp.asarray(vals), jnp.asarray(meta))
        jax.block_until_ready(args)
        best_h2d = min(best_h2d, time.perf_counter() - t0)

    # Device-only time is NOT measurable in-process here: block_until_ready
    # returns before execution completes on this backend, and any forcing
    # fetch degrades the process. The sustained two-point subprocess
    # measurement (bench_tpu_sustained) bounds it instead:
    # device_ms ~= sustained ms_per_clip - demux_ms - h2d_ms.
    st = {
        "demux_ms": round(best_demux * 1000, 2),
        "demux_MBps": round(mbps, 1),
        "h2d_ms": round(best_h2d * 1000, 2),
        "h2d_bytes": int(h2d_bytes),
        "n_frames": n_frames,
    }
    log(f"[bench] {tag} stages: demux {st['demux_ms']} ms "
        f"({st['demux_MBps']} MB/s payload), h2d {st['h2d_ms']} ms "
        f"({h2d_bytes/1e6:.2f} MB)")
    return st


def encode_device_main(name: str) -> None:
    """Subprocess: encode DISPATCH cost in a fresh, never-fetched process
    (block_until_ready returns before execution on this backend, so this
    measures submission, not execution). Its point: the same dispatch that
    takes ~0.1 ms here takes minutes of wall in a process that has fetched
    once — quantifying the tunnel's post-first-fetch degradation that
    dominates the chunk subprocesses' 'device encode' stage."""
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from pfv_tpu.encoding import _CAP_BUCKET, _make_gop_encoder

    c = CONFIGS[name]
    n = min(c["KEY"], c["F"])
    y, u, v = _synth_planes(name, 0, n)
    _, count_max_nnz, make_sparse, meta = _make_gop_encoder(
        c["W"], c["H"], c["Q"], n
    )
    ly, lc = meta["ly"], meta["lc"]

    def pad(frames, shape, clear):
        out = np.full((1, n) + shape, clear, dtype=np.uint8)
        out[0, :, : frames.shape[1], : frames.shape[2]] = frames
        return jnp.asarray(out)

    key = np.zeros((1, n), dtype=bool)
    key[0, 0] = True
    args = (pad(y, ly, 0), pad(u, lc, 128), pad(v, lc, 128),
            jnp.asarray(key))
    jax.block_until_ready(args)
    fn = jax.jit(make_sparse(8 * _CAP_BUCKET))
    out = fn(*args)  # compile + warm
    jax.block_until_ready(out)
    reps = 10
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({"frames": n, "encode_dispatch_ms": round(dt * 1000, 1),
                      }), flush=True)
    os._exit(0)


def encode_device_probe(name: str) -> dict:
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--encode-device", name],
        cwd=_REPO, capture_output=True, text=True, timeout=1800,
    )
    if r.returncode != 0:
        log(f"[bench] encode device probe failed: {r.stderr[-300:]}")
        return {}
    st = json.loads(r.stdout.strip().splitlines()[-1])
    log(f"[bench] {name} encode dispatch-only (async): {st['encode_dispatch_ms']} ms "
        f"/ {st['frames']} frames — submission cost, not execution")
    return st


def pallas_ab(name: str) -> dict:
    """A/B the Pallas vs pure-XLA DCT kernels via the sustained harness in
    fresh subprocesses (the kernel choice is baked at trace time; forced
    completion makes the numbers real)."""
    out = {}
    for setting in ("0", "1"):
        env = dict(os.environ, PFV_PALLAS=setting)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--sustained", name,
             "5"],
            cwd=_REPO, env=env, capture_output=True, text=True, timeout=1800,
        )
        if r.returncode != 0:
            log(f"[bench] pallas A/B ({setting}) failed: {r.stderr[-300:]}")
            return {}
        line = json.loads(r.stdout.strip().splitlines()[-1])
        out["xla" if setting == "0" else "pallas"] = round(
            line["secs"] / line["reps"] * 1000, 1
        )
    log(f"[bench] sustained A/B (incl. const warm offset): XLA "
        f"{out.get('xla')} ms/clip vs Pallas {out.get('pallas')} ms/clip")
    return out


def validate_main(name: str) -> None:
    """Subprocess: device-vs-scalar checksum equality for one corpus (a
    fresh process keeps the D2H fetch off the degraded main process)."""
    _enable_compile_cache()
    from pfv_tpu import runtime
    from pfv_tpu.dataloader import decode_video_checksums, plane_checksums

    data = open(_corpus_path(name), "rb").read()
    n_ref, ry, ru, rv, _ = runtime.ref_decode(data)
    want = plane_checksums(ry, ru, rv)
    got = decode_video_checksums(data)
    ok = bool(
        n_ref == CONFIGS[name]["F"]
        and got.shape == want.shape
        and (got == want).all()
    )
    print(json.dumps({"ok": ok}), flush=True)
    os._exit(0)


def validate(name: str) -> bool | None:
    """Run validate_main in a fresh subprocess; None on timeout/crash."""
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--validate", name],
            cwd=_REPO, capture_output=True, text=True, timeout=900,
        )
        if r.returncode != 0:
            log(f"[bench] validation subprocess failed: {r.stderr[-300:]}")
            return None
        return json.loads(r.stdout.strip().splitlines()[-1])["ok"]
    except subprocess.TimeoutExpired:
        return None


def main():
    _enable_compile_cache()
    import jax

    datas = {name: build_corpus(name) for name in CONFIGS}

    base = {n: bench_baseline(d, n) for n, d in datas.items()}
    log(f"[bench] jax devices: {jax.devices()}")
    host_rate = {n: bench_tpu_host_rate(d, n) for n, d in datas.items()}
    stages = {n: bench_stages(datas[n], n) for n in (PRIMARY, WORST)}
    sustained = {n: bench_tpu_sustained(n) for n in CONFIGS}
    tpu = {n: s.get("fps", 0.0) for n, s in sustained.items()}

    # encode stats recorded by the corpus-encode subprocesses
    enc_stats = {}
    for n in CONFIGS:
        p = _corpus_path(n) + ".encstats.json"
        if os.path.exists(p):
            enc_stats[n] = json.load(open(p))
            log(f"[bench] {n} encode: {enc_stats[n]['encode_fps']} fps, "
                f"stages {enc_stats[n]['stages_ms']}")

    ab = pallas_ab(PRIMARY)
    enc_dev = encode_device_probe(PRIMARY)

    # Correctness: device-vs-scalar per-frame plane checksums, cached by
    # (corpora, code) hash since the tunnel's first device->host fetch costs
    # minutes (and degrades later dispatches, so it must follow timing).
    import hashlib

    h = hashlib.sha256()
    for d in datas.values():
        h.update(d)
    for root, _, files in os.walk(os.path.join(_REPO, "pfv_tpu")):
        for fn in sorted(files):
            if fn.endswith((".py", ".cpp")):
                h.update(open(os.path.join(root, fn), "rb").read())
    marker = os.path.join(CACHE, f"validated_{h.hexdigest()[:16]}")
    if os.path.exists(marker):
        log("[bench] checksum validation cached: ok")
    else:
        oks = [validate(n) for n in (PRIMARY, WORST)]
        if any(o is None for o in oks):
            log("[bench] checksum validation SKIPPED (tunnel D2H stall; "
                "pixel-exactness is covered by tests/)")
        else:
            ok = all(oks)
            log(f"[bench] checksum-exact vs scalar decoder: {ok}")
            if not ok:
                print(json.dumps({
                    "metric": "decode_rgb_fps_1080p", "value": 0.0,
                    "unit": "frames/sec", "vs_baseline": 0.0,
                    "error": "checksum mismatch",
                }), flush=True)
                os._exit(1)
            open(marker, "w").write("ok\n")

    extras = {
        "sustained_fps": {n: round(tpu[n], 1) for n in CONFIGS},
        "vs_baseline": {n: round(tpu[n] / base[n], 2) for n in CONFIGS},
        "host_pipeline_fps": {n: round(host_rate[n], 1) for n in CONFIGS},
        "baseline_fps": {n: round(base[n], 1) for n in CONFIGS},
        "stages": stages,
        "sustained": sustained,
        "encode": enc_stats,
        "encode_device": enc_dev,
        "device_ab_ms": ab,
        "note": ("value = SUSTAINED decode-to-RGB throughput with forced "
                 "completion (device execution included). Rounds before r2 "
                 "reported the async host dispatch rate, which overstates "
                 "throughput when device time exceeds host time; that rate "
                 "is kept as host_pipeline_fps."),
    }
    print(json.dumps({
        "metric": "decode_rgb_fps_1080p",
        "value": round(tpu[PRIMARY], 1),
        "unit": "frames/sec",
        "vs_baseline": round(tpu[PRIMARY] / base[PRIMARY], 2),
        "extras": extras,
    }), flush=True)
    # hard-exit: a validation thread stuck in the tunnel's D2H stall would
    # otherwise crash interpreter teardown
    os._exit(0)


if __name__ == "__main__":
    if "--encode-corpus" in sys.argv:
        encode_corpus_main(sys.argv[sys.argv.index("--encode-corpus") + 1])
        os._exit(0)
    if "--encode-chunk" in sys.argv:
        i = sys.argv.index("--encode-chunk")
        encode_chunk_main(sys.argv[i + 1], int(sys.argv[i + 2]),
                          int(sys.argv[i + 3]), sys.argv[i + 4])
        os._exit(0)
    if "--encode-device" in sys.argv:
        encode_device_main(sys.argv[sys.argv.index("--encode-device") + 1])
    if "--sustained" in sys.argv:
        i = sys.argv.index("--sustained")
        sustained_main(sys.argv[i + 1], int(sys.argv[i + 2]))
    if "--validate" in sys.argv:
        validate_main(sys.argv[sys.argv.index("--validate") + 1])
    main()
