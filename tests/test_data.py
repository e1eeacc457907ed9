"""Data pipeline tests over the bundled mini-datasets in the reference
checkout (reference imgs/ + data/*_ref_test.txt — the reference's own golden
harness inputs, SURVEY §4)."""
import os

import numpy as np
import pytest

from cocosnet_tpu.config import parse_options

IMGS = "/root/reference/imgs"
TABLES = "/root/reference/data"

pytestmark = pytest.mark.skipif(not os.path.isdir(IMGS),
                                reason="reference imgs not mounted")


def _opt(args):
    return parse_options(args + ["--ref_table_dir", TABLES], is_train=False)


def _check_batch(batch, label_ch, n):
    assert batch["label"].shape == (n, 256, 256, label_ch)
    assert batch["image"].shape == (n, 256, 256, 3)
    assert batch["ref"].shape == (n, 256, 256, 3)
    assert batch["label_ref"].shape == (n, 256, 256, label_ch)
    assert batch["image"].min() >= -1.0 and batch["image"].max() <= 1.0
    assert np.all(np.isfinite(batch["image"]))


def test_ade20k_pipeline():
    from cocosnet_tpu.data.loader import create_dataloader
    opt = _opt(["--dataset_mode", "ade20k", "--dataroot", f"{IMGS}/ade20k",
                "--batchSize", "6"])
    dl = create_dataloader(opt)
    batch = next(iter(dl))
    _check_batch(batch, 1, 6)
    # labels are raw class ids in [0, 150]
    assert batch["label"].max() <= 151
    assert batch["self_ref"].sum() == 0  # test phase always uses retrieval


def test_celebahqedge_pipeline():
    from cocosnet_tpu.data.loader import create_dataloader
    opt = _opt(["--dataset_mode", "celebahqedge",
                "--dataroot", f"{IMGS}/celebahqedge", "--batchSize", "4"])
    dl = create_dataloader(opt)
    batch = next(iter(dl))
    _check_batch(batch, 15, 4)
    # channel 0 is the union edge map in [0, 1]
    assert batch["label"][..., 0].max() <= 1.0
    # distance-transform channels have gradient structure
    assert batch["label"][..., 1].std() > 0


def test_deepfashion_pipeline():
    from cocosnet_tpu.data.loader import create_dataloader
    opt = _opt(["--dataset_mode", "deepfashion",
                "--dataroot", f"{IMGS}/DeepFashion", "--batchSize", "4",
                "--no_flip", "--warp_patch", "--video_like"])
    dl = create_dataloader(opt)
    batch = next(iter(dl))
    _check_batch(batch, 20, 4)
    # pose stick figure present in first 3 channels
    assert batch["label"][..., :3].max() > 0


def test_preprocess_input_onehot_roundtrip():
    import jax.numpy as jnp
    from cocosnet_tpu import pix2pix as P
    from cocosnet_tpu.data.loader import create_dataloader
    opt = _opt(["--dataset_mode", "ade20k", "--dataroot", f"{IMGS}/ade20k",
                "--batchSize", "6"])
    dl = create_dataloader(opt)
    batch = next(iter(dl))
    arrays = {k: jnp.asarray(v) for k, v in batch.items()
              if not isinstance(v, list)}
    data = P.preprocess_input(opt, arrays)
    assert data["input_semantics"].shape == (6, 256, 256, 151)
    sums = np.asarray(data["input_semantics"].sum(-1))
    np.testing.assert_allclose(sums, 1.0)  # strict one-hot
    recon = np.asarray(data["input_semantics"].argmax(-1))
    np.testing.assert_array_equal(recon, np.asarray(data["input_label"]))


def test_flickr_pipeline():
    """Flickr has no bundled mini-set; synthesize one (images/, mask/ with
    +1-shifted labels, flickr_ref_test_from_train.txt).

    NB: the fixture root must not contain the substring 'test' — the
    reference's exemplar-path derivation string-replaces the phase folder
    name across the whole path (pix2pix_dataset.py:98)."""
    import numpy as np
    import pathlib
    import shutil
    import tempfile
    from fixtures_util import make_flickr_fixture
    root = pathlib.Path(tempfile.mkdtemp(prefix="flkr_")) / "flickr"
    make_flickr_fixture(root)

    from cocosnet_tpu.data.loader import create_dataloader
    opt = parse_options(
        ["--dataset_mode", "flickr", "--dataroot", str(root),
         "--batchSize", "3", "--ref_table_dir", str(root),
         "--no_pairing_check"], is_train=False)
    try:
        dl = create_dataloader(opt)
        batch = next(iter(dl))
        _check_batch(batch, 1, 3)
        # flickr labels get the +1 shift (base_dataset.py:49-50)
        assert batch["label"].min() >= 1
    finally:
        shutil.rmtree(root.parent, ignore_errors=True)
