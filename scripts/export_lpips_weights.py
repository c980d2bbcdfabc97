"""One-time export of LPIPS(alex) weights to the FGS_LPIPS_WEIGHTS npz.

Run in ANY environment that has `lpips` + `torchvision` installed
(weights download needs network once):

    python scripts/export_lpips_weights.py /path/to/lpips_alex.npz

then point the zero-egress eval at the file:

    FGS_LPIPS_WEIGHTS=/path/to/lpips_alex.npz python run.py --mode eval ...

The npz holds the torchvision AlexNet feature convs (conv{i}_w/b) and
the LPIPS v0.1 linear heads (lin{i}), everything
`fgs_nerf_tpu/eval/lpips_native.py` needs (~9 MB).
"""
import sys

import numpy as np


def main(out_path: str) -> None:
    import lpips
    import torch

    model = lpips.LPIPS(net="alex", version="0.1").eval()
    alex = model.net  # lpips.pretrained_networks.alexnet wrapper
    convs = [m for m in alex.modules()
             if isinstance(m, torch.nn.Conv2d)]
    arrs = {}
    for i, conv in enumerate(convs):
        arrs[f"conv{i}_w"] = conv.weight.detach().numpy()
        arrs[f"conv{i}_b"] = conv.bias.detach().numpy()
    for i, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy()  # [1, C, 1, 1]
        arrs[f"lin{i}"] = w.reshape(-1)
    np.savez_compressed(out_path, **arrs)
    print(f"wrote {out_path}: " + ", ".join(
        f"{k}{v.shape}" for k, v in sorted(arrs.items())))


if __name__ == "__main__":
    if len(sys.argv) != 2:
        print(__doc__)
        raise SystemExit(2)
    main(sys.argv[1])
