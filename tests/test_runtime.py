"""CLI, tracing, checkpoint tests."""

import json

import numpy as np

from ivclab_tpu.cli import main as cli_main
from ivclab_tpu.runtime.checkpoint import GopCheckpointer
from ivclab_tpu.runtime.trace import StageTimer


def run_cli(capsys, *argv):
    cli_main(list(argv))
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_cli_roundtrip_image(capsys):
    out = run_cli(capsys, "roundtrip-image", "fixture:lena_small", "--q", "0.5")
    assert out["psnr_db"] > 26
    assert 0.1 < out["bpp"] < 10


def test_cli_encode_decode_info(tmp_path, capsys):
    ivc = tmp_path / "x.ivc"
    png = tmp_path / "x.png"
    out = run_cli(capsys, "encode-image", "fixture:lena_small", str(ivc), "--q", "0.5")
    assert out["container_bytes"] > 0
    info = run_cli(capsys, "info", str(ivc))
    assert info["shape"] == [256, 256, 3]
    assert info["layout"] == "grouped"
    dec = run_cli(capsys, "decode-image", str(ivc), str(png))
    assert dec["shape"] == [256, 256, 3]
    assert png.exists()


def test_cli_encode_video(capsys, tmp_path):
    out_file = str(tmp_path / "seq.ivc")
    out = run_cli(capsys, "encode-video", "fixture:foreman", out_file,
                  "--frames", "3", "--q", "2.0")
    assert out["frames"] == 3
    assert out["mean_psnr_y_db"] > 24
    assert len(out["per_frame_bits"]) == 3
    import os
    assert os.path.getsize(out_file) > 0


def test_cli_rd_sweep_dpcm(capsys):
    out = run_cli(capsys, "rd-sweep", "--kind", "dpcm")
    qs = [p["q"] for p in out["points"]]
    assert qs == [1, 2, 4, 8, 16, 32, 64]
    bpps = [p["bpp"] for p in out["points"]]
    assert bpps == sorted(bpps, reverse=True)  # coarser quant -> fewer bits


def test_stage_timer():
    t = StageTimer(annotate=False)
    with t.stage("a"):
        sum(range(1000))
    with t.stage("a"):
        pass
    rep = t.report()
    assert rep["a"]["calls"] == 2
    assert rep["a"]["total_s"] >= 0


def test_gop_checkpointer(tmp_path):
    ck = GopCheckpointer(tmp_path)
    assert ck.resume_plan(3) == [0, 1, 2]
    recon = np.zeros((16, 16), np.float32)
    ck.save_gop(1, b"payload-bytes", recon, np.array([100, 50]))
    assert ck.completed_gops() == [1]
    assert ck.resume_plan(3) == [0, 2]
    payload, rec, bits = ck.load_gop(1)
    assert payload == b"payload-bytes"
    assert rec.shape == (16, 16)
    assert bits.tolist() == [100, 50]
    assert ck.load_gop(2) is None
