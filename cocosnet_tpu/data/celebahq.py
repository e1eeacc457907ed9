"""CelebA-HQ mask-to-face dataset (reference data/celebahq_dataset.py).

The label is the all-parts-except-glasses mask interleaved channel-wise with
the binary glasses mask (celebahq_dataset.py:67-84); preprocess_input
de-interleaves it and injects the glasses into one-hot slot -3
(pix2pix_model.py:145-152, 189-193).
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np
from PIL import Image

from cocosnet_tpu.config import Options
from cocosnet_tpu.data import transforms as T
from cocosnet_tpu.data.pix2pix_dataset import (Pix2pixDataset, load_ref_table,
                                               ref_table_path)


class CelebAHQDataset(Pix2pixDataset):
    def get_paths(self, opt: Options) -> Tuple[List[str], List[str]]:
        split = "train.txt" if opt.phase == "train" else "val.txt"
        with open(os.path.join(opt.dataroot, split)) as fd:
            lines = fd.readlines()
        image_paths, label_paths = [], []
        for line in lines:
            name = line.strip()
            image_paths.append(
                os.path.join(opt.dataroot, "CelebA-HQ-img", name + ".jpg"))
            label_paths.append(
                os.path.join(opt.dataroot, "CelebAMask-HQ-mask-anno",
                             "all_parts_except_glasses", name.zfill(5) + ".png"))
        return label_paths, image_paths

    def get_ref(self, opt: Options):
        extra = "_test" if opt.phase == "test" else ""
        table = ref_table_path(opt, f"celebahq_ref{extra}.txt")
        return load_ref_table(table, opt.phase == "test"), ("", "")

    def get_label_tensor(self, path: str):
        # celebahq_dataset.py:67-84
        label_except_glasses = Image.open(path).convert("L")
        root, name = path.replace("\\", "/").split("all_parts_except_glasses/")
        idx = name.split(".")[0]
        subfolder = str(int(idx) // 2000)
        glasses_path = os.path.join(root, subfolder, idx + "_eye_g.png")
        if os.path.exists(glasses_path):
            glasses = Image.open(glasses_path).convert("L")
        else:
            glasses = Image.fromarray(
                np.zeros(label_except_glasses.size, dtype=np.uint8))
        params = T.get_params(self.opt, label_except_glasses.size, self.rng)
        label = T.image_to_tensor(self.opt, label_except_glasses, params,
                                  method=T.NEAREST, normalize=False) * 255.0
        glasses_arr = T.image_to_tensor(self.opt, glasses, params,
                                        method=T.NEAREST, normalize=False)
        return np.concatenate([label, glasses_arr], axis=-1), params

    def imgpath_to_labelpath(self, path: str) -> str:
        root, name = path.split("CelebA-HQ-img/")
        return os.path.join(root, "CelebAMask-HQ-mask-anno",
                            "all_parts_except_glasses",
                            name.split(".")[0].zfill(5) + ".png")
