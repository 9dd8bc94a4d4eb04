"""Flat 128-aligned resident client-data layout (data/stacking.py).

The flat layout is the PRODUCT path (ExperimentConfig.resident_layout
defaults to "flat"): multi-dim features are stored [C, N, 128-aligned D]
and the engine's batch adapter restores logical shapes at the model
boundary. These tests pin (a) the layout round-trip, (b) round-for-round
equivalence of the engine on flat vs NHWC residents, and (c) the
runner-level switch.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_fl_security_tpu.data.datasets import Dataset
from multimodal_fl_security_tpu.data.stacking import (
    ClientData,
    make_batch_adapter,
    stack_clients,
    to_flat_layout,
)


def _toy_clients(c=4, n=32, h=12, w=10, ch=3, num_classes=5, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.normal(0, 1, (c * n, h, w, ch)).astype(np.float32)
    labels = rng.integers(0, num_classes, c * n).astype(np.int32)
    ds = Dataset({"image": images, "label": labels}, num_classes)
    idx = [np.arange(i * n, (i + 1) * n) for i in range(c)]
    return ds, idx


def test_flat_layout_roundtrip_exact():
    ds, idx = _toy_clients()
    nhwc = stack_clients(ds, idx, pad_multiple=8)
    flat = to_flat_layout(nhwc)
    # 12*10*3 = 360 -> padded to 384; logical shape recorded.
    assert flat.arrays["image"].shape[-1] == 384
    assert flat.feature_shapes == {"image": (12, 10, 3)}
    assert flat.arrays["label"].shape == nhwc.arrays["label"].shape
    adapt = make_batch_adapter(flat.feature_shapes)
    restored = adapt({k: v for k, v in flat.arrays.items()})
    np.testing.assert_array_equal(restored["image"], nhwc.arrays["image"])
    np.testing.assert_array_equal(restored["label"], nhwc.arrays["label"])


def test_flat_layout_leaves_vectors_alone():
    rng = np.random.default_rng(1)
    c, n = 3, 16
    ds = Dataset(
        {
            "image": rng.normal(0, 1, (c * n, 8, 8, 1)).astype(np.float32),
            "attribute": rng.normal(0, 1, (c * n, 312)).astype(np.float32),
            "label": rng.integers(0, 4, c * n).astype(np.int32),
        },
        4,
    )
    idx = [np.arange(i * n, (i + 1) * n) for i in range(c)]
    flat = stack_clients(ds, idx, layout="flat")
    assert set(flat.feature_shapes) == {"image"}
    assert flat.arrays["attribute"].shape == (c, n, 312)
    # 8*8*1 = 64 -> 128-aligned
    assert flat.arrays["image"].shape[-1] == 128


def test_adapter_none_when_nothing_flat():
    assert make_batch_adapter({}) is None


def test_engine_rounds_equivalent_flat_vs_nhwc():
    """Two rounds through RoundEngine must produce (near-)identical params
    whether the resident layout is NHWC or flat f32 — the reshape is exact;
    only XLA op ordering may differ."""
    from multimodal_fl_security_tpu.defenses import get_defense
    from multimodal_fl_security_tpu.models import create_model, init_model
    from multimodal_fl_security_tpu.rounds.engine import RoundEngine, TrainSpec

    ds, idx = _toy_clients(c=4, n=32, h=14, w=14, ch=1, num_classes=5,
                           seed=3)
    model = create_model("simple_cnn", num_classes=5)
    spec = TrainSpec(learning_rate=0.05, local_epochs=1, batch_size=16)
    key = jax.random.PRNGKey(0)

    finals = {}
    for layout in ("nhwc", "flat"):
        cd = stack_clients(ds, idx, pad_multiple=16, layout=layout)
        sample = {k: v[0, :16] for k, v in cd.arrays.items()}
        adapt = make_batch_adapter(cd.feature_shapes)
        if adapt is not None:
            sample = adapt(sample)
        params = init_model(model, sample, seed=0)["params"]
        engine = RoundEngine(model, cd, spec,
                             defense=get_defense("median", {}))
        p = params
        for r in range(2):
            p, metrics = engine.run_round(p, jax.random.fold_in(key, r))
        finals[layout] = (p, float(metrics["client_loss_mean"]))

    flat_leaves = jax.tree_util.tree_leaves(finals["flat"][0])
    nhwc_leaves = jax.tree_util.tree_leaves(finals["nhwc"][0])
    for a, b in zip(flat_leaves, nhwc_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    assert abs(finals["flat"][1] - finals["nhwc"][1]) < 1e-5


def test_personalization_flat_layout():
    from multimodal_fl_security_tpu.rounds.engine import TrainSpec
    from multimodal_fl_security_tpu.rounds.personalization import (
        personalized_evaluation,
    )
    from multimodal_fl_security_tpu.models import create_model, init_model

    ds, idx = _toy_clients(c=3, n=16, h=14, w=14, ch=1, num_classes=4,
                           seed=5)
    cd = stack_clients(ds, idx, pad_multiple=8, layout="flat")
    model = create_model("simple_cnn", num_classes=4)
    adapt = make_batch_adapter(cd.feature_shapes)
    sample = adapt({k: v[0, :8] for k, v in cd.arrays.items()})
    params = init_model(model, sample, seed=0)["params"]
    spec = TrainSpec(learning_rate=0.05, local_epochs=1, batch_size=8)
    out = personalized_evaluation(model, params, spec, cd, cd)
    assert out["personalized_accuracy"].shape == (3,)
    assert np.all(np.isfinite(np.asarray(out["personalized_accuracy"])))


def test_runner_layout_switch_equivalent():
    """run_simulation with resident_layout flat vs nhwc: same curves."""
    import multimodal_fl_security_tpu as mft

    base = mft.ExperimentConfig(
        name="flat_eq", dataset="synthetic", num_clients=3, num_rounds=1,
        local_epochs=1, batch_size=16, learning_rate=0.05,
        dataset_params={"num_train": 96, "num_test": 64},
        eval_batch_size=32,
    )
    res = {}
    for layout in ("flat", "nhwc"):
        cfg = dataclasses.replace(base, resident_layout=layout)
        res[layout] = mft.run_simulation(cfg)
    np.testing.assert_allclose(
        res["flat"].round_accuracies, res["nhwc"].round_accuracies,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        res["flat"].round_losses, res["nhwc"].round_losses, atol=1e-5,
    )


def test_flat_bf16_resident_smoke():
    """bf16-stored flat residents run and learn (quantized inputs)."""
    ds, idx = _toy_clients(c=3, n=16, h=14, w=14, ch=1, num_classes=4,
                           seed=7)
    cd = stack_clients(ds, idx, pad_multiple=8, layout="flat",
                       resident_dtype=jnp.bfloat16)
    assert cd.arrays["image"].dtype == jnp.bfloat16
    from multimodal_fl_security_tpu.models import create_model, init_model
    from multimodal_fl_security_tpu.rounds.engine import RoundEngine, TrainSpec

    model = create_model("simple_cnn", num_classes=4, dtype=jnp.bfloat16)
    adapt = make_batch_adapter(cd.feature_shapes)
    sample = adapt({k: v[0, :8] for k, v in cd.arrays.items()})
    params = init_model(model, sample, seed=0)["params"]
    engine = RoundEngine(model, cd, TrainSpec(learning_rate=0.05,
                                              local_epochs=1, batch_size=8))
    p, metrics = engine.run_round(params, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["client_loss_mean"]))
