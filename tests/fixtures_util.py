"""Shared synthetic dataset fixtures for tests (Flickr has no bundled
mini-set in the reference checkout, so we synthesize one)."""

import numpy as np
from PIL import Image as PILImage


def make_flickr_fixture(root, n_images=3, hw=(64, 80), n_classes=20):
    """Build a tiny flickr-layout dataroot (images/, mask/ and the test/
    split, flickr_ref_test_from_train.txt retrieval table) under `root`.

    NB: `root` must not contain the substring 'test' — the reference's
    exemplar-path derivation string-replaces the phase folder name across
    the whole path (pix2pix_dataset.py:98)."""
    (root / "test" / "images").mkdir(parents=True)
    (root / "test" / "mask").mkdir(parents=True)
    (root / "images").mkdir()
    (root / "mask").mkdir()
    rs = np.random.RandomState(0)
    names = [f"img_{i}.jpg" for i in range(n_images)]
    for n in names:
        PILImage.fromarray(
            rs.randint(0, 255, (*hw, 3), dtype=np.uint8)).save(
            root / "test" / "images" / n)
        PILImage.fromarray(
            rs.randint(0, 255, (*hw, 3), dtype=np.uint8)).save(
            root / "images" / n)
        mask = rs.randint(0, n_classes, hw).astype(np.uint8)
        PILImage.fromarray(mask).save(
            root / "test" / "mask" / n.replace(".jpg", ".png"))
        PILImage.fromarray(mask).save(root / "mask" / n.replace(".jpg", ".png"))
    with open(root / "flickr_ref_test_from_train.txt", "w") as f:
        for i, n in enumerate(names):
            f.write(f"{n},{names[(i + 1) % n_images]}\n")
    # train-phase retrieval table (key,easy,hard)
    with open(root / "flickr_ref.txt", "w") as f:
        for i, n in enumerate(names):
            f.write(f"{n},{names[(i + 1) % n_images]},"
                    f"{names[(i + 2) % n_images]}\n")
    return names
