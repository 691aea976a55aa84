"""Fetch torchvision ImageNet ResNet weights and export them as .npz.

The reference hard-depends on torchvision-pretrained encoders
(``weights_init: True`` — reference ``network/fusion_depthnet.py:25-34``,
``configs/ddad/ddad_surround_fusion.yaml:8``). This repo's environments may
have no torchvision and no egress, so the weights ship as a plain ``.npz``
of the torchvision state dict, produced ONCE by this script on any machine
with network access:

    python scripts/fetch_imagenet_weights.py [--layers 18 34 50]

Writes ``assets/weights/resnet<N>_imagenet.npz`` (the default location
``models/torchvision_init.load_resnet_encoder_params`` looks for). The
download uses the public torchvision weight URLs directly (torchvision
itself is not required — only torch, for deserializing the .pth).
"""
import argparse
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# public torchvision IMAGENET1K_V1 checkpoint URLs
_URLS = {
    18: "https://download.pytorch.org/models/resnet18-f37072fd.pth",
    34: "https://download.pytorch.org/models/resnet34-b627a593.pth",
    50: "https://download.pytorch.org/models/resnet50-0676ba61.pth",
}


def fetch(layers: int, out_dir: str) -> str:
    import torch

    url = _URLS[layers]
    os.makedirs(out_dir, exist_ok=True)
    pth = os.path.join(out_dir, os.path.basename(url))
    if not os.path.isfile(pth):
        print(f"downloading {url} ...")
        urllib.request.urlretrieve(url, pth)
    sd = torch.load(pth, map_location="cpu", weights_only=True)
    arrays = {k: v.numpy() for k, v in sd.items()
              if not k.startswith("fc.")}  # the fc head is never used
    out = os.path.join(out_dir, f"resnet{layers}_imagenet.npz")
    np.savez_compressed(out, **arrays)
    os.remove(pth)
    print(f"wrote {out} ({os.path.getsize(out) / 1e6:.1f} MB)")
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, nargs="+", default=[18],
                   choices=sorted(_URLS))
    p.add_argument("--out_dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "weights"))
    args = p.parse_args()
    for n in args.layers:
        fetch(n, args.out_dir)


if __name__ == "__main__":
    main()
