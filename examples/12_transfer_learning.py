"""Transfer learning from a torch checkpoint (the reference's CUB mode).

The reference fine-tunes torchvision's ImageNet ResNet-50 with the
backbone optionally frozen (reference: src/models/cub200_cnn.py:29-54).
This example runs that exact workflow end-to-end with a synthetic
"pretrained" torchvision-format checkpoint, since this environment has
no egress: drop a real ``resnet50-imagenet.pth`` in its place and the
same three steps apply.

  1. convert the torch state_dict  -> models/torch_convert.py
  2. point ``pretrained_path`` at the pickle, set ``freeze_backbone``
  3. run the experiment (norm="batch" makes the conversion exact)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_fl_security_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import numpy as np
import torch

import multimodal_fl_security_tpu as mft
from multimodal_fl_security_tpu.models.torch_convert import convert_file

STAGES = (2, 2, 2, 2)  # resnet18 layout; a real RN50 ckpt uses (3,4,6,3)
WIDTH = 16


def make_fake_torchvision_checkpoint(path: str) -> None:
    """A random bottleneck-ResNet state_dict in torchvision's schema
    (conv1.weight, layerS.B.bnN.running_var, fc.*) standing in for the
    ImageNet download."""
    g = torch.Generator().manual_seed(0)
    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = torch.randn(o, i, k, k, generator=g) * (
            2.0 / (i * k * k)
        ) ** 0.5

    def bn(name, c):
        sd[name + ".weight"] = 0.5 + torch.rand(c, generator=g)
        sd[name + ".bias"] = 0.1 * torch.randn(c, generator=g)
        sd[name + ".running_mean"] = 0.1 * torch.randn(c, generator=g)
        sd[name + ".running_var"] = 0.5 + torch.rand(c, generator=g)

    conv("conv1", WIDTH, 3, 7)
    bn("bn1", WIDTH)
    in_ch = WIDTH
    for s, n_blocks in enumerate(STAGES):
        f = WIDTH * 2 ** s
        for b in range(n_blocks):
            t = f"layer{s + 1}.{b}"
            conv(f"{t}.conv1", f, in_ch, 1)
            bn(f"{t}.bn1", f)
            conv(f"{t}.conv2", f, f, 3)
            bn(f"{t}.bn2", f)
            conv(f"{t}.conv3", 4 * f, f, 1)
            bn(f"{t}.bn3", 4 * f)
            if in_ch != 4 * f:
                conv(f"{t}.downsample.0", 4 * f, in_ch, 1)
                bn(f"{t}.downsample.1", 4 * f)
            in_ch = 4 * f
    sd["fc.weight"] = 0.05 * torch.randn(1000, in_ch, generator=g)
    sd["fc.bias"] = 0.05 * torch.randn(1000, generator=g)
    torch.save(sd, path)


def main() -> None:
    d = tempfile.mkdtemp()
    ckpt = os.path.join(d, "resnet-imagenet.pth")
    make_fake_torchvision_checkpoint(ckpt)

    # Step 1: convert (CLI equivalent:
    #   python -m multimodal_fl_security_tpu.models.torch_convert \
    #       resnet-imagenet.pth pretrained.pkl --stage-sizes 2,2,2,2)
    pretrained = os.path.join(d, "pretrained.pkl")
    _, n = convert_file(ckpt, pretrained, stage_sizes=STAGES)
    print(f"converted {n} tensors -> {pretrained}")

    # Steps 2+3: the 1000-class ImageNet head meets a 10-class task —
    # the backbone transfers by name+shape, the head keeps its fresh
    # init (the reference's replaced-fc semantics), and freeze_backbone
    # trains ONLY the head, like the reference's requires_grad_(False).
    cfg = mft.ExperimentConfig(
        name="transfer_demo",
        dataset="synthetic",
        model="resnet18",
        model_params={"norm": "batch", "width": WIDTH},
        pretrained_path=pretrained,
        freeze_backbone=True,
        num_clients=4,
        num_rounds=3,
        local_epochs=1,
        batch_size=16,
        learning_rate=0.05,
        dataset_params={"num_train": 512, "num_test": 256,
                        "image_size": 32},
    )
    res = mft.run_simulation(cfg)
    print("round accuracies (head-only training):", res.round_accuracies)
    assert np.isfinite(res.final_accuracy)
    print("OK — with a real ImageNet checkpoint, accuracy climbs instead "
          "of hovering (a random backbone gives the head random features).")


if __name__ == "__main__":
    main()
