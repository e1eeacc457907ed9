"""Recursive image-file discovery (reference data/image_folder.py:30-58)."""

from __future__ import annotations

import os
from typing import List

IMG_EXTENSIONS = (".jpg", ".JPG", ".jpeg", ".JPEG", ".png", ".PNG",
                  ".ppm", ".PPM", ".bmp", ".BMP", ".tiff", ".webp")


def is_image_file(filename: str) -> bool:
    return filename.endswith(IMG_EXTENSIONS)


def make_dataset(dir: str, recursive: bool = False, read_cache: bool = False,
                 write_cache: bool = False) -> List[str]:
    images: List[str] = []
    if read_cache:
        possible_filelist = os.path.join(dir, "files.list")
        if os.path.isfile(possible_filelist):
            with open(possible_filelist) as f:
                return f.read().splitlines()
    if recursive:
        for root, _, fnames in sorted(os.walk(dir, followlinks=True)):
            for fname in sorted(fnames):
                if is_image_file(fname):
                    images.append(os.path.join(root, fname))
    else:
        assert os.path.isdir(dir) or os.path.islink(dir), \
            f"{dir} is not a valid directory"
        for root, _, fnames in sorted(os.walk(dir)):
            for fname in sorted(fnames):
                if is_image_file(fname):
                    images.append(os.path.join(root, fname))
    if write_cache:
        filelist_cache = os.path.join(dir, "files.list")
        with open(filelist_cache, "w") as f:
            f.write("\n".join(images))
            print(f"wrote filelist cache at {filelist_cache}")
    return images
