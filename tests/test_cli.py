"""CLI surface: encode -> info -> decode -> bench round trip."""

import numpy as np


def test_cli_roundtrip(tmp_path, capsys):
    from pfv_tpu.cli import main

    pfv = str(tmp_path / "clip.pfv")
    out = str(tmp_path / "out.npy")

    main(["encode", pfv, "--synth", "5", "--size", "64x48", "--quality", "4",
          "--keyframe-every", "3", "--fps", "24"])
    main(["info", pfv])
    main(["decode", pfv, "--output", out])
    main(["bench", pfv, "--runs", "2"])

    text = capsys.readouterr().out
    assert "encoded 5 frames 64x48 q4" in text
    assert "64x48 @ 24 fps, 4 q-tables" in text
    assert "2 I-frames, 3 P-frames" in text
    assert "RUN 1" in text

    rgb = np.load(out)
    assert rgb.shape == (5, 48, 64, 3) and rgb.dtype == np.uint8


def test_cli_npy_input_roundtrip(tmp_path, capsys):
    from pfv_tpu.cli import main
    from pfv_tpu.utils.synth import synth_rgb_frame

    src = np.stack([synth_rgb_frame(t, 64, 48) for t in range(4)])
    inp = str(tmp_path / "in.npy")
    np.save(inp, src)
    pfv = str(tmp_path / "c.pfv")
    out = str(tmp_path / "o.npy")
    main(["encode", pfv, "--input", inp, "--quality", "2"])
    main(["decode", pfv, "--output", out])
    got = np.load(out)
    assert got.shape == src.shape
    # RGB PSNR includes 4:2:0 point-decimation loss on noisy synthetic
    # texture; Y-only fidelity is asserted in test_end_to_end
    mse = np.mean((got.astype(float) - src.astype(float)) ** 2)
    assert 10 * np.log10(255.0**2 / mse) > 18


def test_stage_timer():
    import time

    from pfv_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    rep = t.report()
    assert "a" in rep and "2 calls" in rep.replace("    2", "2")
    assert t.counts["a"] == 2 and t.totals["a"] >= 0.01


def test_cli_play(tmp_path, capsys):
    from pfv_tpu.cli import main

    pfv = str(tmp_path / "p.pfv")
    main(["encode", pfv, "--synth", "4", "--size", "64x48", "--quality", "6",
          "--keyframe-every", "2", "--fps", "240"])
    main(["play", pfv, "--width", "32", "--max-frames", "3"])
    out = capsys.readouterr().out
    assert "▀" in out
    import re

    # advance_delta may pump several frames per tick -> small overshoot ok
    m = re.search(r"played (\d+) frames @ 240 fps nominal", out)
    assert m and 3 <= int(m.group(1)) <= 4, out[-200:]

    # loop mode replays from the first packet (4-frame clip, >4 played)
    main(["play", pfv, "--width", "16", "--max-frames", "6", "--loop"])
    out = capsys.readouterr().out
    m = re.search(r"played (\d+) frames", out)
    assert m and int(m.group(1)) >= 6


def test_cli_verify(tmp_path, capsys):
    from pfv_tpu.cli import main

    pfv = str(tmp_path / "v.pfv")
    main(["encode", pfv, "--synth", "4", "--size", "64x48", "--quality", "3",
          "--keyframe-every", "2"])
    main(["verify", pfv])
    out = capsys.readouterr().out
    assert "OK: 4 frames" in out


def test_top_level_exports():
    import pfv_tpu

    assert callable(pfv_tpu.encode_video)
    assert callable(pfv_tpu.decode_video_rgb)
    assert callable(pfv_tpu.decode_video_yuv)
    assert pfv_tpu.VideoDataLoader is not None
    import pytest

    with pytest.raises(AttributeError):
        pfv_tpu.nonexistent_thing


def test_cli_info_frames(tmp_path, capsys):
    from pfv_tpu.cli import main

    pfv = str(tmp_path / "i.pfv")
    main(["encode", pfv, "--synth", "3", "--size", "64x48", "--keyframe-every", "2"])
    main(["info", pfv, "--frames"])
    out = capsys.readouterr().out
    assert "packet    0:     I" in out
    assert "packet    1:     P" in out
    assert "packet    3:   EOF" in out
