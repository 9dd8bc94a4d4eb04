"""torchvision state_dict -> flax ResNet conversion.

The strong claim under test: a converted checkpoint reproduces torch's
EVAL forward pass numerically (BN stats folded exactly, torch-exact
padding), so the reference's transfer-learning mode
(reference: src/models/cub200_cnn.py:29-38) works with the reference's
own checkpoint format. torch (CPU) is available in this environment, so
the oracle is a functional torch reconstruction of bottleneck-ResNet
inference driven by the same state_dict — no torchvision needed.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from multimodal_fl_security_tpu.models import create_model, init_model
from multimodal_fl_security_tpu.models.pretrained import load_pretrained
from multimodal_fl_security_tpu.models.torch_convert import (
    convert_file,
    convert_torch_resnet_state_dict,
)

STAGES = (2, 2)  # two bottleneck stages: full wiring (projection,
#                  stride-2 stage transition) at CPU-test size
WIDTH = 16


def make_state_dict(stages=STAGES, width=WIDTH, num_classes=11, seed=0):
    """A random torchvision-schema bottleneck-ResNet state_dict."""
    g = torch.Generator().manual_seed(seed)

    sd = {}

    def conv(name, o, i, k):
        w = torch.randn(o, i, k, k, generator=g)
        sd[name + ".weight"] = w * (2.0 / (i * k * k)) ** 0.5

    def bn(name, c):
        sd[name + ".weight"] = 0.5 + torch.rand(c, generator=g)
        sd[name + ".bias"] = 0.1 * torch.randn(c, generator=g)
        sd[name + ".running_mean"] = 0.1 * torch.randn(c, generator=g)
        sd[name + ".running_var"] = 0.5 + torch.rand(c, generator=g)
        sd[name + ".num_batches_tracked"] = torch.tensor(1)

    conv("conv1", width, 3, 7)
    bn("bn1", width)
    in_ch = width
    for s, n_blocks in enumerate(stages):
        f = width * 2 ** s
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
    sd["fc.weight"] = 0.05 * torch.randn(num_classes, in_ch, generator=g)
    sd["fc.bias"] = 0.05 * torch.randn(num_classes, generator=g)
    return sd


def torch_forward(x, sd, stages=STAGES):
    """Functional eval-mode forward of the torchvision bottleneck ResNet."""

    def tbn(x, p):
        return F.batch_norm(
            x, sd[p + ".running_mean"], sd[p + ".running_var"],
            sd[p + ".weight"], sd[p + ".bias"], training=False, eps=1e-5,
        )

    def block(x, t, stride):
        out = F.relu(tbn(F.conv2d(x, sd[t + ".conv1.weight"]), t + ".bn1"))
        out = F.conv2d(out, sd[t + ".conv2.weight"], stride=stride,
                       padding=1)
        out = F.relu(tbn(out, t + ".bn2"))
        out = tbn(F.conv2d(out, sd[t + ".conv3.weight"]), t + ".bn3")
        if t + ".downsample.0.weight" in sd:
            sc = tbn(F.conv2d(x, sd[t + ".downsample.0.weight"],
                              stride=stride), t + ".downsample.1")
        else:
            sc = x
        return F.relu(out + sc)

    x = F.relu(tbn(F.conv2d(x, sd["conv1.weight"], stride=2, padding=3),
                   "bn1"))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    for s, n_blocks in enumerate(stages):
        for b in range(n_blocks):
            stride = 2 if s > 0 and b == 0 else 1
            x = block(x, f"layer{s + 1}.{b}", stride)
    x = x.mean(dim=(2, 3))
    return F.linear(x, sd["fc.weight"], sd["fc.bias"])


def _flax_model(num_classes=11):
    from multimodal_fl_security_tpu.models.resnet import ResNet

    return ResNet(num_classes=num_classes, stage_sizes=STAGES, width=WIDTH,
                  norm="batch", head_dropout=0.0)


def test_converted_forward_matches_torch_eval():
    sd = make_state_dict()
    converted = convert_torch_resnet_state_dict(sd, stage_sizes=STAGES)

    model = _flax_model()
    x = np.random.default_rng(0).normal(size=(2, 33, 33, 3)).astype(
        np.float32
    )  # odd spatial size: exercises the floor-division output sizing too
    init = init_model(model, {"image": jnp.asarray(x)}, seed=0)["params"]
    # The converted tree must cover the init tree exactly (same structure).
    assert sorted(converted) == sorted(init)

    got = model.apply({"params": converted}, {"image": jnp.asarray(x)},
                      train=False)
    want = torch_forward(torch.from_numpy(x.transpose(0, 3, 1, 2)), sd)
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=2e-4, atol=2e-4
    )


def test_convert_file_then_load_pretrained_replaces_head(tmp_path):
    sd = make_state_dict(num_classes=11)
    raw = tmp_path / "ckpt.pth"
    torch.save(sd, raw)
    out = tmp_path / "pretrained.pkl"
    convert_file(str(raw), str(out), stage_sizes=STAGES)

    # A 7-class model meets the 11-class checkpoint: backbone transfers,
    # head keeps its fresh init (the reference's replaced-fc semantics).
    model = _flax_model(num_classes=7)
    init = init_model(
        model, {"image": jnp.zeros((1, 33, 33, 3))}, seed=0
    )["params"]
    params, info = load_pretrained(init, str(out))
    assert info["missing"] == []
    assert sorted(info["reinitialized"]) == [
        "Dense_0/bias", "Dense_0/kernel",
    ]
    stem = np.asarray(params["Conv_0"]["kernel"])
    np.testing.assert_allclose(
        stem, sd["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    )


def test_group_norm_mode_transfers_affine_only():
    sd = make_state_dict()
    converted = convert_torch_resnet_state_dict(
        sd, stage_sizes=STAGES, norm="group"
    )
    np.testing.assert_allclose(
        converted["GroupNorm_0"]["scale"], sd["bn1.weight"].numpy()
    )
    np.testing.assert_allclose(
        converted["GroupNorm_0"]["bias"], sd["bn1.bias"].numpy()
    )


def test_torch_checkpoint_to_runner_end_to_end(tmp_path):
    """The full reference-user workflow in one path: a torch ``.pth``
    checkpoint -> convert_file -> nested reference-schema YAML config
    (model section carrying norm/width as factory kwargs) ->
    run_simulation with the backbone frozen."""
    import multimodal_fl_security_tpu as mft
    from multimodal_fl_security_tpu.utils.yaml_config import config_from_dict

    sd = make_state_dict(stages=(2, 2, 2, 2), width=8, num_classes=10)
    raw = tmp_path / "ckpt.pth"
    torch.save(sd, raw)
    out = tmp_path / "pretrained.pkl"
    convert_file(str(raw), str(out), stage_sizes=(2, 2, 2, 2))

    cfg = config_from_dict({
        "experiment": {"name": "torch-e2e", "seed": 0},
        "data": {"dataset": "synthetic"},
        "dataset_params": {"num_train": 48, "num_test": 32,
                           "image_size": 32},
        "model": {"name": "resnet18", "norm": "batch", "width": 8,
                  "head_dropout": 0.0,
                  "pretrained_path": str(out), "freeze_backbone": True},
        "server": {"num_clients": 2, "num_rounds": 1},
        "client": {"local_epochs": 1, "batch_size": 8},
    })
    res = mft.run_simulation(cfg)
    assert np.isfinite(res.final_accuracy)
    assert res.round_accuracies, "no rounds ran"


def test_basic_block_checkpoint_rejected():
    sd = make_state_dict()
    del sd["layer1.0.conv3.weight"]
    with pytest.raises(ValueError, match="BasicBlock"):
        convert_torch_resnet_state_dict(sd, stage_sizes=STAGES)


def test_stage_size_mismatch_rejected():
    sd = make_state_dict()
    with pytest.raises(ValueError, match="does not match"):
        convert_torch_resnet_state_dict(sd, stage_sizes=(2, 2, 2))
    with pytest.raises(ValueError, match="more stages"):
        convert_torch_resnet_state_dict(sd, stage_sizes=(2,))
