"""Convert a torchvision ResNet state_dict into this zoo's parameter tree.

The reference fine-tunes torchvision's ImageNet ResNet-50
(reference: src/models/cub200_cnn.py:29-38, ``IMAGENET1K_V2`` weights) —
so the real-world "pretrained checkpoint" a reference user holds is a
torch ``state_dict`` (``conv1.weight``, ``layer3.5.bn2.running_var``, ...),
not a flax pytree. This module maps that schema onto
:class:`multimodal_fl_security_tpu.models.resnet.ResNet` so the
reference's transfer-learning mode is literally one torchvision-file-drop
away::

    python -m multimodal_fl_security_tpu.models.torch_convert \
        resnet50-imagenet.pth pretrained.pkl
    # then: ExperimentConfig(model="resnet50", norm="batch",
    #                        pretrained_path="pretrained.pkl", ...)

Mapping rules
-------------
* Conv weights: torch ``[O, I, kh, kw]`` -> flax HWIO ``[kh, kw, I, O]``.
* BatchNorm -> ``norm="batch"`` (:class:`~.resnet.FrozenBatchNorm`):
  eval-mode BN is the per-channel affine ``y = x*s + t`` with
  ``s = gamma / sqrt(running_var + eps)`` and ``t = beta - running_mean*s``
  — folded exactly, so the converted model reproduces torch's eval
  forward (verified numerically in tests/test_torch_convert.py against a
  functional torch reconstruction; the ResNet uses torch-exact explicit
  padding for this reason).
* BatchNorm -> ``norm="group"``: NOT exact — GroupNorm re-normalizes at
  runtime, so running statistics cannot be folded. The affine
  (``gamma``/``beta``) is transferred and the stats are discarded; use
  ``norm="batch"`` when eval-equivalence with torch matters.
* ``fc``: transposed into the ``Dense_0`` head. A head with a different
  class count is handled downstream: ``load_pretrained`` re-initializes
  shape-mismatched leaves (the reference replaces fc the same way,
  cub200_cnn.py:33-38).

Only bottleneck ResNets (resnet50/101/152-style, and this zoo's
bottleneck "resnet18") are supported; torchvision's BasicBlock
state_dicts (real resnet18/34) are detected and rejected with a clear
error.
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, Mapping, Sequence, Tuple

import numpy as np

_BN_EPS = 1e-5  # torch.nn.BatchNorm2d default


def _np(t: Any) -> np.ndarray:
    """Materialize a torch tensor (or array-like) as float32 numpy."""
    if hasattr(t, "detach"):  # torch.Tensor without importing torch
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _conv(sd: Mapping[str, Any], key: str) -> Dict[str, np.ndarray]:
    return {"kernel": _np(sd[key]).transpose(2, 3, 1, 0)}


def _bn(sd: Mapping[str, Any], prefix: str, norm: str) -> Dict[str, np.ndarray]:
    gamma = _np(sd[f"{prefix}.weight"])
    beta = _np(sd[f"{prefix}.bias"])
    if norm == "group":
        return {"scale": gamma, "bias": beta}
    s = gamma / np.sqrt(_np(sd[f"{prefix}.running_var"]) + _BN_EPS)
    return {"scale": s, "bias": beta - _np(sd[f"{prefix}.running_mean"]) * s}


def convert_torch_resnet_state_dict(
    state_dict: Mapping[str, Any],
    stage_sizes: Sequence[int] = (3, 4, 6, 3),
    norm: str = "batch",
) -> Dict[str, Any]:
    """Return a params dict matching ``ResNet(stage_sizes, norm=...)``.

    ``state_dict`` may be the raw torchvision mapping or a checkpoint
    wrapping it under a ``"state_dict"`` key (``module.``/``model.``
    prefixes are stripped).
    """
    sd = dict(state_dict.get("state_dict", state_dict))
    sd = {
        k.removeprefix("module.").removeprefix("model."): v
        for k, v in sd.items()
    }
    if "conv1.weight" not in sd:
        raise ValueError(
            "not a torchvision ResNet state_dict: missing 'conv1.weight' "
            f"(got keys like {sorted(sd)[:3]})"
        )
    if "layer1.0.conv3.weight" not in sd:
        raise ValueError(
            "state_dict uses BasicBlock (torchvision resnet18/34); this "
            "zoo's ResNet is bottleneck-only — convert a resnet50-family "
            "checkpoint instead"
        )
    norm_mod = {"batch": "FrozenBatchNorm", "group": "GroupNorm"}[norm]

    params: Dict[str, Any] = {
        "Conv_0": _conv(sd, "conv1.weight"),
        f"{norm_mod}_0": _bn(sd, "bn1", norm),
    }
    block_idx = 0
    for stage, n_blocks in enumerate(stage_sizes):
        for b in range(n_blocks):
            t = f"layer{stage + 1}.{b}"
            if f"{t}.conv1.weight" not in sd:
                raise ValueError(
                    f"stage_sizes {tuple(stage_sizes)} does not match the "
                    f"checkpoint: '{t}.conv1.weight' is absent"
                )
            blk: Dict[str, Any] = {}
            for i in range(3):
                blk[f"Conv_{i}"] = _conv(sd, f"{t}.conv{i + 1}.weight")
                blk[f"{norm_mod}_{i}"] = _bn(sd, f"{t}.bn{i + 1}", norm)
            if f"{t}.downsample.0.weight" in sd:
                # Projection shortcut -> the block's 4th conv/norm pair.
                blk["Conv_3"] = _conv(sd, f"{t}.downsample.0.weight")
                blk[f"{norm_mod}_3"] = _bn(sd, f"{t}.downsample.1", norm)
            params[f"ResNetBlock_{block_idx}"] = blk
            block_idx += 1
    if f"layer{len(stage_sizes) + 1}.0.conv1.weight" in sd:
        raise ValueError(
            f"checkpoint has more stages than stage_sizes "
            f"{tuple(stage_sizes)}"
        )
    if "fc.weight" in sd:
        params["Dense_0"] = {"kernel": _np(sd["fc.weight"]).T}
        if "fc.bias" in sd:
            params["Dense_0"]["bias"] = _np(sd["fc.bias"])
    return params


def convert_file(
    in_path: str,
    out_path: str,
    stage_sizes: Sequence[int] = (3, 4, 6, 3),
    norm: str = "batch",
) -> Tuple[Dict[str, Any], int]:
    """Load ``in_path`` (torch .pth, or a pickle of arrays), convert, and
    write a ``load_pretrained``-compatible pickle to ``out_path``.

    Returns ``(params, n_leaves)``.
    """
    try:
        import torch

        state_dict = torch.load(
            in_path, map_location="cpu", weights_only=True
        )
    except ImportError:  # pragma: no cover - torch is baked into this env
        with open(in_path, "rb") as f:
            state_dict = pickle.load(f)
    params = convert_torch_resnet_state_dict(
        state_dict, stage_sizes=stage_sizes, norm=norm
    )
    with open(out_path, "wb") as f:
        pickle.dump(params, f)
    n = sum(
        1 for blk in params.values() for _ in blk.values()
    )
    return params, n


def main(argv: Sequence[str] = None) -> None:
    import argparse

    ap = argparse.ArgumentParser(
        description="torchvision ResNet state_dict -> pretrained_path pickle"
    )
    ap.add_argument("in_path", help=".pth checkpoint or pickled state_dict")
    ap.add_argument("out_path", help="output pickle for pretrained_path")
    ap.add_argument(
        "--stage-sizes", default="3,4,6,3",
        help="comma-separated bottleneck stage sizes (default: ResNet-50)",
    )
    ap.add_argument(
        "--norm", choices=("batch", "group"), default="batch",
        help="target norm mode; 'batch' folds BN stats exactly",
    )
    args = ap.parse_args(argv)
    sizes = tuple(int(s) for s in args.stage_sizes.split(","))
    _, n = convert_file(args.in_path, args.out_path,
                        stage_sizes=sizes, norm=args.norm)
    print(f"wrote {args.out_path}: {n} tensors (norm={args.norm}, "
          f"stage_sizes={sizes})")


if __name__ == "__main__":
    main()
