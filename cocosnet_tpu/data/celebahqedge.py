"""CelebA-HQ edge-to-face dataset (reference data/celebahqedge_dataset.py).

15-channel label: [0] union of inter-part edges + background Canny edges
masked outside the face, [1..13] per-part L1 distance-transform maps,
[14] inner-part edges only (celebahqedge_dataset.py:76-116).
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np
from PIL import Image

from cocosnet_tpu.config import Options
from cocosnet_tpu.data import edges as E
from cocosnet_tpu.data import native as NAT
from cocosnet_tpu.data import transforms as T
from cocosnet_tpu.data.pix2pix_dataset import (Pix2pixDataset, load_ref_table,
                                               ref_table_path)

INNER_PARTS = ["skin", "l_brow", "r_brow", "l_eye", "r_eye", "l_ear", "r_ear",
               "nose", "u_lip", "mouth", "l_lip", "eye_g", "hair"]


class CelebAHQEdgeDataset(Pix2pixDataset):
    def get_paths(self, opt: Options) -> Tuple[List[str], List[str]]:
        split = "train.txt" if opt.phase == "train" else "val.txt"
        with open(os.path.join(opt.dataroot, split)) as fd:
            lines = fd.readlines()
        image_paths, label_paths = [], []
        for line in lines:
            name = line.strip()
            image_paths.append(
                os.path.join(opt.dataroot, "CelebA-HQ-img", name + ".jpg"))
            subfolder = str(int(name) // 2000)
            label_paths.append(
                os.path.join(opt.dataroot, "CelebAMask-HQ-mask-anno",
                             subfolder, name.zfill(5) + "_{}.png"))
        return label_paths, image_paths

    def get_ref(self, opt: Options):
        extra = "_test" if opt.phase == "test" else ""
        table = ref_table_path(opt, f"celebahq_ref{extra}.txt")
        return load_ref_table(table, opt.phase == "test"), ("", "")

    def get_label_tensor(self, path: str):
        # celebahqedge_dataset.py:76-116
        opt = self.opt
        img_path = self.labelpath_to_imgpath(path)
        img = Image.open(img_path).resize((opt.load_size, opt.load_size),
                                          resample=Image.BILINEAR)
        params = T.get_params(opt, img.size, self.rng)

        size = img.size
        inner_label = np.ones(size, dtype=np.uint8)
        edges = np.zeros(size, dtype=np.uint8)
        dist_maps = []
        for part in INNER_PARTS:
            edge = np.zeros(size, dtype=np.uint8)
            if os.path.exists(path.format(part)):
                part_label = np.array(
                    Image.open(path.format(part)).convert("L").resize(
                        (opt.load_size, opt.load_size), resample=Image.NEAREST))
                if part == "hair":
                    inner_label[part_label == 255] = 1
                else:
                    inner_label[part_label == 255] = 0
                edges = NAT.mask_edges(edges, part_label)
                edge = NAT.mask_edges(edge, part_label)
            im_dist = NAT.distance_transform_map(edge)
            dist_maps.append(T.image_to_tensor(
                opt, Image.fromarray(im_dist), params,
                method=T.BILINEAR, normalize=False))

        canny_edges = NAT.canny(np.array(img.convert("L"))) * inner_label
        edges_all = np.clip(edges + canny_edges, 0, 1).astype(np.uint8)
        tensor_edges_all = T.image_to_tensor(
            opt, Image.fromarray(edges_all * 255), params,
            method=T.NEAREST, normalize=False)
        edges = np.clip(edges, 0, 1).astype(np.uint8)
        tensor_edges = T.image_to_tensor(
            opt, Image.fromarray(edges * 255), params,
            method=T.NEAREST, normalize=False)
        label = np.concatenate([tensor_edges_all] + dist_maps + [tensor_edges],
                               axis=-1)
        return label, params

    def imgpath_to_labelpath(self, path: str) -> str:
        root, name = path.split("CelebA-HQ-img/")
        subfolder = str(int(name.split(".")[0]) // 2000)
        return os.path.join(root, "CelebAMask-HQ-mask-anno", subfolder,
                            name.split(".")[0].zfill(5) + "_{}.png")

    def labelpath_to_imgpath(self, path: str) -> str:
        root = path.replace("\\", "/").split("CelebAMask-HQ-mask-anno/")[0]
        name = os.path.basename(path).split("_")[0]
        return os.path.join(root, "CelebA-HQ-img", str(int(name)) + ".jpg")

    def paths_match(self, p1: str, p2: str) -> bool:
        return True  # template-vs-image names never match textually
