"""Fetch (or install from a local source) the torchvision ImageNet ResNet
checkpoints that weights_init='pretrained' needs.

The reference downloads from the torchvision model zoo at import time
(reference networks/resnet_encoder.py:46-49); air-gapped TPU hosts can't,
so this script makes the weight provisioning explicit and verifiable:

  python scripts/fetch_pretrained.py --depths 18 50            # download
  python scripts/fetch_pretrained.py --from /mnt/weights_dir   # copy local
  python scripts/fetch_pretrained.py --check                   # verify only

Checkpoints land in --dest (default: the torch hub cache that
models/pretrained.find_checkpoint searches). Every file is verified against
the sha256 prefix embedded in the torchvision filename before install.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import shutil
import sys

# torchvision IMAGENET1K_V1 weights — the exact files the reference's
# pretrained=True resolves to (filename embeds the first 8 sha256 chars)
CHECKPOINTS = {
    18: "resnet18-f37072fd.pth",
    34: "resnet34-b627a593.pth",
    50: "resnet50-0676ba61.pth",
    101: "resnet101-63fe2227.pth",
    152: "resnet152-394f9c45.pth",
}
BASE_URL = "https://download.pytorch.org/models/"


def default_dest() -> str:
    torch_home = os.environ.get(
        "TORCH_HOME", os.path.join(os.path.expanduser("~"), ".cache",
                                   "torch"))
    return os.path.join(torch_home, "hub", "checkpoints")


def sha256_prefix(path: str, n: int = 8) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()[:n]


def verify(path: str, fname: str) -> bool:
    want = fname.rsplit("-", 1)[1].split(".")[0]
    got = sha256_prefix(path, len(want))
    if got != want:
        print(f"CHECKSUM MISMATCH {path}: sha256[:8]={got}, want {want}",
              file=sys.stderr)
        return False
    return True


def install(src: str, dest_dir: str, fname: str) -> bool:
    if not verify(src, fname):
        return False
    os.makedirs(dest_dir, exist_ok=True)
    dst = os.path.join(dest_dir, fname)
    if os.path.abspath(src) != os.path.abspath(dst):
        shutil.copy2(src, dst)
    print(f"installed {dst}")
    return True


def find_local(source: str, fname: str, depth: int):
    if os.path.isfile(source):
        return source
    for cand in (os.path.join(source, fname),):
        if os.path.isfile(cand):
            return cand
    import glob

    hits = sorted(glob.glob(os.path.join(source, f"resnet{depth}*.pth")))
    return hits[0] if hits else None


def download(url: str, out: str) -> bool:
    import urllib.request

    try:
        print(f"downloading {url} ...")
        with urllib.request.urlopen(url, timeout=60) as r, \
                open(out, "wb") as f:
            shutil.copyfileobj(r, f)
        return True
    except Exception as e:
        print(f"download failed: {e}", file=sys.stderr)
        return False


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--depths", type=int, nargs="+", default=[18, 50],
                   choices=sorted(CHECKPOINTS))
    p.add_argument("--dest", default=default_dest(),
                   help="install directory (default: torch hub cache)")
    p.add_argument("--from", dest="source", default=None,
                   help="local .pth file or directory to install from "
                        "instead of downloading (offline hosts)")
    p.add_argument("--check", action="store_true",
                   help="only verify already-installed checkpoints")
    args = p.parse_args()

    ok = True
    for depth in args.depths:
        fname = CHECKPOINTS[depth]
        dst = os.path.join(args.dest, fname)
        if os.path.isfile(dst) and verify(dst, fname):
            print(f"resnet{depth}: already installed at {dst}")
            continue
        if args.check:
            print(f"resnet{depth}: MISSING ({dst})", file=sys.stderr)
            ok = False
            continue
        if args.source:
            src = find_local(args.source, fname, depth)
            if src is None:
                print(f"resnet{depth}: not found under {args.source}",
                      file=sys.stderr)
                ok = False
                continue
            ok = install(src, args.dest, fname) and ok
        else:
            tmp = dst + ".part"
            os.makedirs(args.dest, exist_ok=True)
            if download(BASE_URL + fname, tmp) and verify(tmp, fname):
                os.replace(tmp, dst)
                print(f"installed {dst}")
            else:
                if os.path.exists(tmp):
                    os.remove(tmp)
                print(f"resnet{depth}: could not provision (zero-egress "
                      f"host? use --from <dir|file>)", file=sys.stderr)
                ok = False
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
