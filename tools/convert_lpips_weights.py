"""Convert torch LPIPS(VGG) weights to the npz consumed by
quadraturefields_tpu.utils.lpips.

The reference evaluates lpips.LPIPS(net="vgg")
(examples/train_ngp_nerf_sg_occ.py:262-264); our JAX implementation
needs (a) the torchvision VGG16 `features` conv stack and (b) the
lpips package's per-tap linear calibration weights. This environment
has no network egress, so the tool converts from local files:

  python tools/convert_lpips_weights.py \
      --vgg16 /path/to/vgg16-397923af.pth \
      --lpips /path/to/lpips_vgg.pth \
      --out lpips_vgg.npz

Then point QF_LPIPS_WEIGHTS at the npz (or pass weights_path to
LPIPS). Evaluations report NaN for LPIPS until the file exists —
plumbing is wired either way.
"""
from __future__ import annotations

import argparse

import numpy as np

# torchvision VGG16 features indices that are convolutions
_VGG16_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def convert(vgg16_path: str, lpips_path: str, out_path: str):
    import torch

    vgg = torch.load(vgg16_path, map_location="cpu", weights_only=True)
    out = {}
    for idx in _VGG16_CONV_IDX:
        for part in ("weight", "bias"):
            key = f"features.{idx}.{part}"
            if key not in vgg:
                raise KeyError(
                    f"{key} missing from {vgg16_path}: not a torchvision "
                    "VGG16 state dict"
                )
            out[key] = vgg[key].numpy().astype(np.float32)

    lin = torch.load(lpips_path, map_location="cpu", weights_only=True)
    # lpips package layout: lin{k}.model.1.weight [1, C, 1, 1]
    for k in range(5):
        for cand in (f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight"):
            if cand in lin:
                out[f"lin{k}.weight"] = (
                    lin[cand].numpy().reshape(-1).astype(np.float32)
                )
                break
        else:
            raise KeyError(
                f"calibration weights for tap {k} not found in "
                f"{lpips_path} (keys: {sorted(lin.keys())[:8]}...)"
            )
    np.savez(out_path, **out)
    print(f"wrote {out_path}: {len(out)} arrays")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--vgg16", required=True,
                   help="torchvision vgg16 state-dict .pth")
    p.add_argument("--lpips", required=True,
                   help="lpips package vgg.pth (linear calibration)")
    p.add_argument("--out", default="lpips_vgg.npz")
    args = p.parse_args(argv)
    convert(args.vgg16, args.lpips, args.out)


if __name__ == "__main__":
    main()
