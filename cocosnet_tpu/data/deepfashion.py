"""DeepFashion pose-to-image dataset (reference data/deepfashion_dataset.py).

20-channel label: a 3-channel OpenPose stick figure rasterized with fixed
limb colors plus 17 per-limb distance-transform channels
(deepfashion_dataset.py:111-169). Ref pairing has a `video_like` mode that
prefers same-person different-view pairs (deepfashion_dataset.py:54-78).
"""

from __future__ import annotations

import math
import os
from typing import List, Tuple

import cv2
import numpy as np
from PIL import Image

from cocosnet_tpu.config import Options
from cocosnet_tpu.data import native as NAT
from cocosnet_tpu.data import transforms as T
from cocosnet_tpu.data.pix2pix_dataset import Pix2pixDataset, ref_table_path

LIMB_SEQ = [[2, 3], [2, 6], [3, 4], [4, 5], [6, 7], [7, 8], [2, 9], [9, 10],
            [10, 11], [2, 12], [12, 13], [13, 14], [2, 1], [1, 15], [15, 17],
            [1, 16], [16, 18], [3, 17], [6, 18]]

COLORS = [[255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0],
          [170, 255, 0], [85, 255, 0], [0, 255, 0], [0, 255, 85],
          [0, 255, 170], [0, 255, 255], [0, 170, 255], [0, 85, 255],
          [0, 0, 255], [85, 0, 255], [170, 0, 255], [255, 0, 255],
          [255, 0, 170], [255, 0, 85]]


def render_pose(candidate: np.ndarray, subset: np.ndarray,
                img_shape: Tuple[int, int, int]):
    """Rasterize the 18-joint stick figure + 17 per-limb maps
    (deepfashion_dataset.py:125-152)."""
    stickwidth = 4
    canvas = np.zeros(img_shape, dtype=np.uint8)
    for i in range(18):
        index = int(subset[i])
        if index == -1:
            continue
        x, y = candidate[index][0:2]
        cv2.circle(canvas, (int(x), int(y)), 4, COLORS[i], thickness=-1)
    joints = []
    for i in range(17):
        index = subset[np.array(LIMB_SEQ[i]) - 1]
        cur_canvas = canvas.copy()
        if -1 in index:
            joints.append(np.zeros_like(cur_canvas[:, :, 0]))
            continue
        yy = candidate[index.astype(int), 0]
        xx = candidate[index.astype(int), 1]
        m_x, m_y = np.mean(xx), np.mean(yy)
        length = ((xx[0] - xx[1]) ** 2 + (yy[0] - yy[1]) ** 2) ** 0.5
        angle = math.degrees(math.atan2(xx[0] - xx[1], yy[0] - yy[1]))
        polygon = cv2.ellipse2Poly((int(m_y), int(m_x)),
                                   (int(length / 2), stickwidth),
                                   int(angle), 0, 360, 1)
        cv2.fillConvexPoly(cur_canvas, polygon, COLORS[i])
        canvas = cv2.addWeighted(canvas, 0.4, cur_canvas, 0.6, 0)
        joint = np.zeros_like(cur_canvas[:, :, 0])
        cv2.fillConvexPoly(joint, polygon, 255)
        joint = cv2.addWeighted(joint, 0.4, joint, 0.6, 0)
        joints.append(joint)
    return canvas, joints


class DeepFashionDataset(Pix2pixDataset):
    def get_paths(self, opt: Options) -> Tuple[List[str], List[str]]:
        split = "train.txt" if opt.phase == "train" else "val.txt"
        with open(os.path.join(opt.dataroot, split)) as fd:
            lines = fd.readlines()
        image_paths, label_paths = [], []
        for line in lines:
            name = line.strip().replace("\\", "/")
            image_paths.append(os.path.join(opt.dataroot, name))
            label_paths.append(os.path.join(
                opt.dataroot,
                name.replace("img", "pose").replace(".jpg", "_{}.txt")))
        return label_paths, image_paths

    def get_ref(self, opt: Options):
        if opt.video_like:
            return self.get_ref_video_like(opt)
        return self.get_ref_vgg(opt)

    def get_ref_video_like(self, opt: Options):
        # deepfashion_dataset.py:54-78
        pair_path = ref_table_path(opt, "deepfashion_self_pair.txt")
        key_name = {}
        with open(pair_path) as fd:
            for line in fd:
                items = line.strip().split(",")
                if items and items[0]:
                    key_name[items[0]] = items[1:]
        extra = "_test" if opt.phase == "test" else ""
        ref_path = ref_table_path(opt, f"deepfashion_ref{extra}.txt")
        split = "DeepFashion/"
        ref_dict = {}
        with open(ref_path) as fd:
            for line in fd:
                items = line.strip().split(",")
                if not items or not items[0]:
                    continue
                key = items[0].replace("\\", "/")
                sample = [p.split(split)[-1] for p in self.rng.sample(
                    self.image_paths, min(len(self.image_paths), 20))]
                if items[0] in key_name:
                    ref_dict[key] = [it.replace("\\", "/")
                                     for it in key_name[items[0]]] + sample
                else:
                    ref_dict[key] = [items[-1].replace("\\", "/")] + sample
        return ref_dict, ("", "")

    def get_ref_vgg(self, opt: Options):
        # deepfashion_dataset.py:80-96
        extra = "_test" if opt.phase == "test" else ""
        ref_path = ref_table_path(opt, f"deepfashion_ref{extra}.txt")
        ref_dict = {}
        with open(ref_path) as fd:
            for line in fd:
                items = line.strip().split(",")
                if not items or not items[0]:
                    continue
                key = items[0].replace("\\", "/")
                if opt.phase == "test":
                    ref_dict[key] = [it.replace("\\", "/") for it in items[1:]]
                else:
                    rand_img = self.rng.choice(self.image_paths)
                    ref_dict[key] = [
                        items[-1].replace("\\", "/"),
                        rand_img.split("DeepFashion/")[-1].replace("\\", "/")]
        return ref_dict, ("", "")

    def get_label_tensor(self, path: str):
        # deepfashion_dataset.py:111-169
        opt = self.opt
        candidate = np.loadtxt(path.format("candidate"))
        subset = np.loadtxt(path.format("subset"))
        candidate = np.atleast_2d(candidate)
        img_path = self.labelpath_to_imgpath(path)
        img = cv2.imread(img_path)
        canvas, joints = render_pose(candidate, subset, img.shape)
        pose = Image.fromarray(
            cv2.cvtColor(canvas, cv2.COLOR_BGR2RGB)).resize(
            (opt.load_size, opt.load_size), resample=Image.NEAREST)
        params = T.get_params(opt, pose.size, self.rng)
        dist_maps = []
        for joint in joints:
            # joints are 0/255 maps; the native DT treats nonzero as sources
            im_dist = NAT.distance_transform_map((joint > 0).astype(np.uint8))
            dist_maps.append(T.image_to_tensor(
                opt, Image.fromarray(im_dist), params,
                method=T.BILINEAR, normalize=False))
        tensor_pose = T.image_to_tensor(opt, pose, params,
                                        method=T.NEAREST, normalize=False)
        return np.concatenate([tensor_pose] + dist_maps, axis=-1), params

    def imgpath_to_labelpath(self, path: str) -> str:
        return path.replace("\\", "/").replace(
            "/img/", "/pose/").replace(".jpg", "_{}.txt")

    def labelpath_to_imgpath(self, path: str) -> str:
        return path.replace("\\", "/").replace(
            "/pose/", "/img/").replace("_{}.txt", ".jpg")

    def paths_match(self, p1: str, p2: str) -> bool:
        return True
