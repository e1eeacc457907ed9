"""Smoke tests for tools/serve.py: the server must route labels through the
real dataset preprocessing pipelines (celebahqedge 15-ch edge+DT, deepfashion
pose raster + DT) rather than raw PNG resizes (round-1 ADVICE), and must
refuse to serve random weights unless explicitly allowed."""

import os
import shutil
import sys

import numpy as np
import pytest
from PIL import Image

IMGS = "/root/reference/imgs"

pytestmark = pytest.mark.skipif(not os.path.isdir(IMGS),
                                reason="reference imgs not mounted")


def _run_serve(monkeypatch, tmp_path, dataset_args):
    import tools.serve as serve
    watch = tmp_path / "in"
    out = tmp_path / "out"
    watch.mkdir()
    argv = ["serve.py", "--watch_dir", str(watch), "--out_dir", str(out),
            "--once", "--allow_random_weights", "--batchSize", "2",
            "--crop_size", "64", "--load_size", "64",
            "--checkpoints_dir", str(tmp_path / "ckpt"),
            "--platform", "cpu"] + dataset_args
    return serve, watch, out, argv


def test_serve_celebahqedge(monkeypatch, tmp_path):
    serve, watch, out, argv = _run_serve(monkeypatch, tmp_path, [
        "--name", "edge_smoke", "--dataset_mode", "celebahqedge"])
    anno = f"{IMGS}/celebahqedge/CelebAMask-HQ-mask-anno"
    tmpl_a = f"{anno}/11/22233_{{}}.png"
    tmpl_b = f"{anno}/13/26397_{{}}.png"
    if not os.path.exists(tmpl_a.format("nose")):
        pytest.skip("expected fixture missing")
    (watch / "r0.label.txt").write_text(tmpl_a)
    (watch / "r0.ref_label.txt").write_text(tmpl_b)
    ref_img = f"{IMGS}/celebahqedge/CelebA-HQ-img/26397.jpg"
    if not os.path.exists(ref_img):
        imgs = os.listdir(f"{IMGS}/celebahqedge/CelebA-HQ-img")
        ref_img = os.path.join(f"{IMGS}/celebahqedge/CelebA-HQ-img", imgs[0])
    shutil.copy(ref_img, watch / "r0.ref.jpg")
    monkeypatch.setattr(sys, "argv", argv)
    serve.main()
    result = out / "r0.png"
    assert result.exists(), list(out.iterdir())
    arr = np.asarray(Image.open(result))
    assert arr.shape == (64, 64, 3)
    assert arr.std() > 0  # not a constant image


def test_serve_deepfashion(monkeypatch, tmp_path):
    serve, watch, out, argv = _run_serve(monkeypatch, tmp_path, [
        "--name", "pose_smoke", "--dataset_mode", "deepfashion",
        "--warp_patch", "--no_flip"])
    pose = (f"{IMGS}/DeepFashion/pose/WOMEN/Tees_Tanks/id_00007059/"
            "03_3_back_{}.txt")
    pose_ref = (f"{IMGS}/DeepFashion/pose/WOMEN/Cardigans/id_00006462/"
                "02_7_additional_{}.txt")
    if not os.path.exists(pose.format("candidate")):
        pytest.skip("expected fixture missing")
    (watch / "q.label.txt").write_text(pose)
    (watch / "q.ref_label.txt").write_text(pose_ref)
    shutil.copy(f"{IMGS}/DeepFashion/img/WOMEN/Cardigans/id_00006462/"
                "02_7_additional.jpg", watch / "q.ref.jpg")
    monkeypatch.setattr(sys, "argv", argv)
    serve.main()
    assert (out / "q.png").exists(), list(out.iterdir())


def test_serve_refuses_random_weights(monkeypatch, tmp_path):
    import tools.serve as serve
    watch = tmp_path / "in"
    watch.mkdir()
    argv = ["serve.py", "--watch_dir", str(watch),
            "--out_dir", str(tmp_path / "out"), "--once",
            "--batchSize", "1", "--crop_size", "64", "--load_size", "64",
            "--checkpoints_dir", str(tmp_path / "ckpt"),
            "--platform", "cpu", "--name", "nockpt",
            "--dataset_mode", "ade20k"]
    monkeypatch.setattr(sys, "argv", argv)
    with pytest.raises(SystemExit):
        serve.main()


def test_serve_bad_request_writes_error(monkeypatch, tmp_path):
    serve, watch, out, argv = _run_serve(monkeypatch, tmp_path, [
        "--name", "bad_smoke", "--dataset_mode", "ade20k"])
    # ref image but no label -> error file, no crash
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(watch / "x.ref.jpg")
    monkeypatch.setattr(sys, "argv", argv)
    serve.main()
    assert (out / "x.error.txt").exists()


def test_serve_unexpected_pipeline_error_does_not_kill_worker(
        monkeypatch, tmp_path):
    """An exception class the pipeline was not expected to raise must still
    produce an .error.txt and let --once terminate — previously it killed
    the preprocessor thread silently and the server hung (round-3 review)."""
    from cocosnet_tpu.data.loader import dataset_registry
    cls = dataset_registry()["ade20k"]

    def boom(self, path):
        raise RuntimeError("synthetic pipeline failure")

    monkeypatch.setattr(cls, "get_label_tensor", boom)
    serve, watch, out, argv = _run_serve(monkeypatch, tmp_path, [
        "--name", "boom_smoke", "--dataset_mode", "ade20k"])
    Image.fromarray(np.zeros((64, 64), np.uint8)).save(watch / "y.label.png")
    Image.fromarray(np.zeros((64, 64), np.uint8)).save(
        watch / "y.ref_label.png")
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(watch / "y.ref.jpg")
    monkeypatch.setattr(sys, "argv", argv)
    serve.main()  # --once must return, not hang
    err = out / "y.error.txt"
    assert err.exists()
    assert "RuntimeError" in err.read_text()
