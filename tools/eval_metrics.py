#!/usr/bin/env python
"""Quality metrics for generated images: SWD and FID.

The CoCosNet paper reports FID and SWD against the real test distribution
(BASELINE.md: ade20k FID 26.4 / SWD 10.5, celebahqedge 14.3/15.2,
deepfashion 14.4/17.2). The reference repo ships NO evaluation code — these
are the standard third-party definitions:

- SWD: sliced Wasserstein distance over Laplacian-pyramid patch descriptors
  (Karras et al., "Progressive Growing of GANs", appendix A; the metric the
  paper's SWDx10^2 column uses). Weight-free: 7x7x3 patches at each pyramid
  level, per-patch channel normalization, random 1-D projections, sorted-
  projection L1. Deterministic here (fixed seed) so runs are comparable.
- FID: Frechet distance between Gaussians fitted to pooled features of an
  image-classifier backbone (Heusel et al. 2017). The canonical backbone is
  InceptionV3 pool3; this environment has no inception weights, so the
  extractor is pluggable: --feature inception uses torchvision when its
  weights are available, --feature vgg (default) uses our VGG19 relu5_2
  average-pooled features (weights from assets/vgg19_conv.npz). VGG-FID
  values are NOT comparable to paper Inception-FID numbers — use them for
  relative tracking between runs/checkpoints (lower = better), and switch to
  --feature inception for paper-comparable numbers when weights exist.

Usage:
  python tools/eval_metrics.py --fake_dir out/test/ade20k --real_dir <real>
      [--metrics swd,fid] [--feature vgg] [--max_images N] [--out m.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# --------------------------------------------------------------------- SWD

def _laplacian_pyramid(batch: np.ndarray, levels: int):
    """batch: (N,H,W,3) float32 in [0,255]. Returns list of (N,h,w,3) bands,
    finest first, via 5x5 binomial blur + 2x decimation (PGGAN appendix A)."""
    k1 = np.array([1., 4., 6., 4., 1.], np.float32)
    k2 = np.outer(k1, k1)
    k2 /= k2.sum()

    def blur(x):
        # separable 5x5 binomial, reflect padding, NHWC
        from scipy.ndimage import convolve
        out = np.empty_like(x)
        for n in range(x.shape[0]):
            for c in range(3):
                out[n, :, :, c] = convolve(x[n, :, :, c], k2, mode="reflect")
        return out

    pyramid = []
    cur = batch
    for _ in range(levels - 1):
        low = blur(cur)[:, ::2, ::2]
        up = np.repeat(np.repeat(low, 2, axis=1), 2, axis=2)
        up = blur(up.astype(np.float32))
        pyramid.append(cur - up[:, :cur.shape[1], :cur.shape[2]])
        cur = low
    pyramid.append(cur)
    return pyramid


def _patch_descriptors(band: np.ndarray, n_patches: int, rng: np.random.RandomState,
                       patch: int = 7) -> np.ndarray:
    """Random 7x7x3 patches, normalized per channel over the patch set."""
    n, h, w, _ = band.shape
    idx_img = rng.randint(0, n, n_patches)
    ys = rng.randint(0, h - patch + 1, n_patches)
    xs = rng.randint(0, w - patch + 1, n_patches)
    out = np.empty((n_patches, patch, patch, 3), np.float32)
    for i, (ii, y, x) in enumerate(zip(idx_img, ys, xs)):
        out[i] = band[ii, y:y + patch, x:x + patch]
    mu = out.mean(axis=(0, 1, 2), keepdims=True)
    sd = out.std(axis=(0, 1, 2), keepdims=True) + 1e-8
    out = (out - mu) / sd
    return out.reshape(n_patches, -1)


def _sliced_wasserstein(a: np.ndarray, b: np.ndarray, n_proj: int,
                        rng: np.random.RandomState) -> float:
    d = a.shape[1]
    dist = 0.0
    reps = 4
    for _ in range(reps):
        proj = rng.randn(d, n_proj).astype(np.float32)
        proj /= np.linalg.norm(proj, axis=0, keepdims=True) + 1e-12
        pa = np.sort(a @ proj, axis=0)
        pb = np.sort(b @ proj, axis=0)
        dist += float(np.mean(np.abs(pa - pb)))
    return dist / reps


def swd(fake: np.ndarray, real: np.ndarray, n_patches: int = 8192,
        n_proj: int = 128, seed: int = 0, min_size: int = 16):
    """PGGAN sliced Wasserstein distance. fake/real: (N,H,W,3) uint8 or
    float in [0,255]. Returns {level_size: swd*1e2, 'avg': mean} — the
    paper's SWDx10^2 convention."""
    fake = np.asarray(fake, np.float32)
    real = np.asarray(real, np.float32)
    h = fake.shape[1]
    levels = 1
    while h // (2 ** levels) >= min_size:
        levels += 1
    pf = _laplacian_pyramid(fake, levels)
    pr = _laplacian_pyramid(real, levels)
    out = {}
    vals = []
    for lf, lr in zip(pf, pr):
        rng = np.random.RandomState(seed)
        npatch = min(n_patches, lf.shape[0] * 128)
        da = _patch_descriptors(lf, npatch, rng)
        rng = np.random.RandomState(seed)
        db = _patch_descriptors(lr, npatch, rng)
        rng = np.random.RandomState(seed + 1)
        v = _sliced_wasserstein(da, db, n_proj, rng) * 1e2
        out[int(lf.shape[1])] = v
        vals.append(v)
    out["avg"] = float(np.mean(vals))
    return out


# --------------------------------------------------------------------- FID

def fid_from_features(f1: np.ndarray, f2: np.ndarray) -> float:
    """Frechet distance between N(mu1,C1) and N(mu2,C2) fitted to (N,D)
    feature matrices."""
    mu1, mu2 = f1.mean(0), f2.mean(0)
    c1 = np.cov(f1, rowvar=False)
    c2 = np.cov(f2, rowvar=False)
    diff = mu1 - mu2
    # sqrtm(c1 @ c2) via scipy when present, else eigen fallback
    try:
        from scipy import linalg
        covmean = linalg.sqrtm(c1 @ c2)
        if np.iscomplexobj(covmean):
            covmean = covmean.real
        tr_covmean = np.trace(covmean)
    except ImportError:
        w, v = np.linalg.eigh((c1 @ c2 + (c1 @ c2).T) / 2)
        tr_covmean = np.sum(np.sqrt(np.maximum(w, 0)))
    return float(diff @ diff + np.trace(c1) + np.trace(c2) - 2 * tr_covmean)


def vgg_feature_extractor(batch_size: int = 8):
    """(N,H,W,3)[0,255] -> (N,512) spatially-pooled VGG19 relu5_2 features
    using the training-loss VGG tower (weights from assets/vgg19_conv.npz
    when present — WITHOUT weights the features are random and FID is
    meaningless; the CLI warns)."""
    import jax
    import jax.numpy as jnp
    from cocosnet_tpu.nn.vgg import VGG19Features

    vgg = VGG19Features(vgg_normal_correct=True)
    variables = jax.jit(lambda k, x: vgg.init(k, x, ["r52"]))(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32))
    weights = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets", "vgg19_conv.npz")
    loaded = False
    if os.path.exists(weights):
        from tools.convert_weights import load_vgg_npz
        variables = load_vgg_npz(weights, variables)
        loaded = True

    @jax.jit
    def run(v, x):
        feats = vgg.apply(v, x, ["r52"])[0]
        return jnp.mean(feats, axis=(1, 2))

    def extract(images: np.ndarray) -> np.ndarray:
        images = np.asarray(images, np.float32) / 127.5 - 1.0  # [-1,1]
        outs = []
        for i in range(0, len(images), batch_size):
            chunk = images[i:i + batch_size]
            pad = batch_size - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.zeros_like(chunk[:1].repeat(pad, 0))])
            f = np.asarray(run(variables, jnp.asarray(chunk)))
            outs.append(f[:batch_size - pad] if pad else f)
        return np.concatenate(outs)

    extract.loaded_weights = loaded
    return extract


def inception_feature_extractor(batch_size: int = 8):
    """torchvision InceptionV3 pool3 (paper-standard FID). Raises if the
    pretrained weights cannot be loaded (no-egress environments)."""
    import torch
    from torchvision.models import inception_v3

    net = inception_v3(weights="IMAGENET1K_V1", aux_logits=True).eval()
    layers = torch.nn.Sequential(
        net.Conv2d_1a_3x3, net.Conv2d_2a_3x3, net.Conv2d_2b_3x3,
        torch.nn.MaxPool2d(3, 2), net.Conv2d_3b_1x1, net.Conv2d_4a_3x3,
        torch.nn.MaxPool2d(3, 2), net.Mixed_5b, net.Mixed_5c, net.Mixed_5d,
        net.Mixed_6a, net.Mixed_6b, net.Mixed_6c, net.Mixed_6d, net.Mixed_6e,
        net.Mixed_7a, net.Mixed_7b, net.Mixed_7c,
        torch.nn.AdaptiveAvgPool2d(1))

    def extract(images: np.ndarray) -> np.ndarray:
        outs = []
        with torch.no_grad():
            for i in range(0, len(images), batch_size):
                x = torch.from_numpy(
                    np.asarray(images[i:i + batch_size], np.float32) / 255.0)
                x = x.permute(0, 3, 1, 2)
                x = torch.nn.functional.interpolate(
                    x, size=(299, 299), mode="bilinear", align_corners=False)
                x = (x - 0.5) / 0.5
                outs.append(layers(x).squeeze(-1).squeeze(-1).numpy())
        return np.concatenate(outs)

    return extract


# ---------------------------------------------------------------------- IO

def load_image_dir(path: str, max_images: int = 0, size: int = 0) -> np.ndarray:
    from PIL import Image
    exts = (".png", ".jpg", ".jpeg", ".webp", ".bmp")
    files = sorted(
        os.path.join(r, f) for r, _, fs in os.walk(path)
        for f in fs if f.lower().endswith(exts))
    if max_images:
        files = files[:max_images]
    if not files:
        raise FileNotFoundError(f"no images under {path}")
    imgs = []
    for f in files:
        im = Image.open(f).convert("RGB")
        if size:
            im = im.resize((size, size), Image.BICUBIC)
        imgs.append(np.asarray(im, np.uint8))
    return np.stack(imgs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fake_dir", required=True)
    ap.add_argument("--real_dir", required=True)
    ap.add_argument("--metrics", default="swd,fid")
    ap.add_argument("--feature", default="vgg", choices=["vgg", "inception"])
    ap.add_argument("--max_images", type=int, default=0)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    fake = load_image_dir(args.fake_dir, args.max_images, args.size)
    real = load_image_dir(args.real_dir, args.max_images, args.size)
    print(f"{len(fake)} fake vs {len(real)} real images at {args.size}px")

    results = {}
    if "swd" in args.metrics:
        results["swd_x100"] = swd(fake, real)
        print(f"SWD x100: {results['swd_x100']}")
    if "fid" in args.metrics:
        if args.feature == "inception":
            extract = inception_feature_extractor()
            key = "fid_inception"
        else:
            extract = vgg_feature_extractor()
            key = "fid_vgg"
            if not extract.loaded_weights:
                print("WARNING: assets/vgg19_conv.npz missing — FID uses "
                      "RANDOM features and is meaningless", file=sys.stderr)
        results[key] = fid_from_features(extract(fake), extract(real))
        print(f"{key}: {results[key]:.3f}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    main()
