#!/usr/bin/env python
"""One-command activation of the released-weights fidelity gate.

The reference's contract is its released checkpoints plus the committed
golden grids (/root/reference/README.md:43-75, output/test/*/0.png). The
converter (tools/convert_weights.py) and the PSNR>=40 gate
(tests/test_golden.py) are implemented; the only missing piece in a
no-egress environment is the weight files themselves. This tool makes
activation one command the moment the files exist anywhere reachable:

    python tools/fetch_weights.py --from <dir-with-downloads>
    python -m pytest tests/test_golden.py -q

What it does, in order, per artifact:
  1. already installed?  -> verify + report
  2. found under --from / $COCOSNET_WEIGHTS_SRC / common paths -> install
     (copy .pth checkpoints into checkpoints/<name>/, convert
     models/vgg19_conv.pth -> assets/vgg19_conv.npz)
  3. network + gdown available -> download from the reference's published
     Google Drive folders (URLs below), then install
  4. otherwise -> print exactly what is missing and where to put it

Released artifacts (reference README.md:43-75):
  vgg19_conv.pth   https://drive.google.com/file/d/1fp7DAiXdf0Ay-jANb8f0RHYLTRyjNv4m
  ade20k           https://drive.google.com/drive/folders/1BEBBENbEr9tutZsyGGc3REUuuOYqf6M3
  celebahq         https://drive.google.com/drive/folders/16xgIrGzGBKJWbAUROM71wiA1cf7zrQk5
  celebahqedge     https://drive.google.com/drive/folders/1SCUrAPsEb6HOx8EtI89ED4wsOR8mrPDF
  deepfashion      https://drive.google.com/drive/folders/1vyzTdhQqY9ljsAx4u4xPvytX3wR75GYB
Each checkpoint folder holds latest_net_G.pth / latest_net_Corr.pth (and
EMA variants for some models).
"""

import argparse
import hashlib
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DRIVE = {
    "vgg19_conv.pth": "1fp7DAiXdf0Ay-jANb8f0RHYLTRyjNv4m",
    "ade20k": "1BEBBENbEr9tutZsyGGc3REUuuOYqf6M3",
    "celebahq": "16xgIrGzGBKJWbAUROM71wiA1cf7zrQk5",
    "celebahqedge": "1SCUrAPsEb6HOx8EtI89ED4wsOR8mrPDF",
    "deepfashion": "1vyzTdhQqY9ljsAx4u4xPvytX3wR75GYB",
}
MODELS = ("ade20k", "celebahq", "celebahqedge", "deepfashion")
CKPT_FILES = ("latest_net_G.pth", "latest_net_Corr.pth")


def sha256(path: str, limit: int = 1 << 26) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(1 << 20)
            if not b:
                break
            h.update(b)
    return h.hexdigest()[:16]


def find_file(name: str, roots) -> str | None:
    for root in roots:
        if not root or not os.path.isdir(root):
            continue
        for dirpath, _, files in os.walk(root):
            if name in files:
                return os.path.join(dirpath, name)
    return None


def install_vgg(src_roots, assets_dir: str) -> bool:
    npz = os.path.join(assets_dir, "vgg19_conv.npz")
    if os.path.exists(npz):
        print(f"[ok] VGG features already converted: {npz}")
        return True
    pth = find_file("vgg19_conv.pth", src_roots)
    if pth is None:
        return False
    os.makedirs(assets_dir, exist_ok=True)
    print(f"converting {pth} (sha256:{sha256(pth)}) -> {npz}")
    from tools.convert_weights import convert_vgg_to_npz
    convert_vgg_to_npz(pth, npz)
    print(f"[ok] {npz}")
    return True


def install_ckpts(name: str, src_roots, ckpt_root: str) -> bool:
    dst = os.path.join(ckpt_root, name)
    have = all(os.path.exists(os.path.join(dst, f)) for f in CKPT_FILES)
    if have:
        print(f"[ok] {name}: checkpoints present under {dst}")
        return True
    found = {}
    for f in CKPT_FILES:
        # released archives sometimes nest under the model name
        p = (find_file(f, [os.path.join(r, name) for r in src_roots if r])
             or find_file(f, src_roots))
        if p:
            found[f] = p
    if len(found) != len(CKPT_FILES):
        return False
    os.makedirs(dst, exist_ok=True)
    for f, p in found.items():
        print(f"installing {p} (sha256:{sha256(p)}) -> {dst}/{f}")
        shutil.copy2(p, os.path.join(dst, f))
        # EMA variants ride along when present
    for ema in ("latest_net_G_ema.pth", "latest_net_netCorr_ema.pth"):
        p = find_file(ema, src_roots)
        if p:
            shutil.copy2(p, os.path.join(dst, ema))
    return True


def try_gdown(missing, dl_dir: str) -> None:
    try:
        import gdown  # noqa: F401
    except ImportError:
        print("(gdown not installed — skipping network download; this "
              "environment is typically egress-free)")
        return
    os.makedirs(dl_dir, exist_ok=True)
    import gdown
    print("WARNING: the Drive IDs below come from the untrusted reference "
          "README and no pinned digests exist for the released archives — "
          "downloaded .pth files are pickle-deserialized by torch.load at "
          "conversion time. Verify the printed sha256 against a trusted "
          "source before installing, or convert in a sandbox.")
    for item in missing:
        fid = DRIVE[item]
        try:
            if item.endswith(".pth"):
                gdown.download(id=fid, output=os.path.join(dl_dir, item))
            else:
                gdown.download_folder(id=fid,
                                      output=os.path.join(dl_dir, item))
        except Exception as e:
            print(f"download of {item} failed: {e}")


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--from", dest="src", default=None,
                    help="directory holding downloaded weights (searched "
                         "recursively)")
    ap.add_argument("--checkpoints_dir",
                    default=os.path.join(REPO, "checkpoints"))
    ap.add_argument("--assets_dir", default=os.path.join(REPO, "assets"))
    ap.add_argument("--download", action="store_true",
                    help="attempt Google Drive download via gdown (needs "
                         "network egress)")
    args = ap.parse_args()

    src_roots = [args.src, os.environ.get("COCOSNET_WEIGHTS_SRC"),
                 os.path.join(REPO, "downloads"), "/root/weights",
                 "/root/reference/models", "/root/reference/checkpoints"]

    missing = []
    if not install_vgg(src_roots, args.assets_dir):
        missing.append("vgg19_conv.pth")
    for name in MODELS:
        if not install_ckpts(name, src_roots, args.checkpoints_dir):
            missing.append(name)

    if missing and args.download:
        dl = os.path.join(REPO, "downloads")
        try_gdown(missing, dl)
        still = []
        if "vgg19_conv.pth" in missing and \
                not install_vgg(src_roots + [dl], args.assets_dir):
            still.append("vgg19_conv.pth")
        for name in [m for m in missing if m != "vgg19_conv.pth"]:
            if not install_ckpts(name, src_roots + [dl],
                                 args.checkpoints_dir):
                still.append(name)
        missing = still

    if not missing:
        print("\nAll released weights installed. Activate the fidelity "
              "gate with:\n  python -m pytest tests/test_golden.py -q")
        return 0
    print("\nStill missing:", ", ".join(missing))
    print("Download from the Drive links in this file's docstring, place "
          "anywhere under --from/<dir> (or set $COCOSNET_WEIGHTS_SRC), and "
          "re-run. The 4 golden-PSNR skips in the test suite become "
          "pass/fail the moment the files are installed — no other wiring.")
    return 1


if __name__ == "__main__":
    sys.exit(main())
