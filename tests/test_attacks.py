"""Attack unit tests.

Mirrors the reference's exact-count and in-bounds checks (reference:
tests/test_attacks.py) plus the cross-modal spec tests (reference:
tests/test_asr_crossmodal.py:219-340) and on-device model-poisoning tests
the reference's simulation path never exercised (SURVEY.md §2.9-2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_fl_security_tpu.attacks import get_attack
from multimodal_fl_security_tpu.attacks.backdoor import (
    apply_trigger,
    make_trigger,
    trigger_position,
)
from multimodal_fl_security_tpu.data.datasets import Dataset


def mock_dataset(n=100, num_classes=10, shape=(28, 28, 1), seed=0,
                 with_attrs=False, num_attributes=50):
    rng = np.random.RandomState(seed)
    arrays = {
        "image": rng.rand(n, *shape).astype(np.float32),
        "label": rng.randint(0, num_classes, size=n).astype(np.int32),
    }
    if with_attrs:
        arrays["attributes"] = (rng.rand(n, num_attributes) > 0.5).astype(
            np.float32
        )
    return Dataset(arrays, num_classes)


# ------------------------------------------------------------- label flip ---
def test_label_flip_exact_count():
    ds = mock_dataset(200, seed=1)
    n_source = int((ds.labels == 7).sum())
    atk = get_attack("label_flip", {"source_class": 7, "target_class": 1,
                                    "poison_ratio": 0.5, "seed": 42})
    poisoned = atk.poison_dataset(ds)
    expected = int(n_source * 0.5)
    assert atk.num_poisoned == expected
    # Flipped samples now carry the target label; untouched 7s remain.
    assert int((poisoned.labels == 7).sum()) == n_source - expected
    # Images unchanged (pure label attack).
    np.testing.assert_array_equal(poisoned.arrays["image"], ds.arrays["image"])


def test_label_flip_classification_flags():
    atk = get_attack("label_flip", {})
    assert atk.is_data_poisoning() and not atk.is_model_poisoning()


def test_all_to_one_exact_count():
    ds = mock_dataset(150, seed=2)
    atk = get_attack("all_to_one", {"target_class": 3, "poison_ratio": 0.3})
    poisoned = atk.poison_dataset(ds)
    assert atk.num_poisoned == int(150 * 0.3)  # reference: :99-114
    assert (poisoned.labels[atk.poisoned_indices] == 3).all()


# --------------------------------------------------------------- backdoor ---
@pytest.mark.parametrize("ttype", ["square", "cross", "corner", "checkerboard"])
def test_trigger_shapes(ttype):
    trig = make_trigger(ttype, 3)
    assert trig.shape == (3, 3)
    assert trig.max() == 1.0  # reference: :120-128


@pytest.mark.parametrize("pos", ["bottom_right", "top_left", "top_right",
                                 "bottom_left", "center"])
def test_trigger_positions_in_bounds(pos):
    row, col = trigger_position(pos, (28, 28), 3)
    assert 0 <= row and row + 3 <= 28
    assert 0 <= col and col + 3 <= 28  # reference: :130-143


def test_apply_trigger_replaces_patch():
    imgs = np.zeros((2, 28, 28, 1), np.float32)
    trig = make_trigger("checkerboard", 3)
    out = apply_trigger(imgs, trig, (24, 24))
    np.testing.assert_array_equal(out[0, 24:27, 24:27, 0], trig)
    assert out[:, :24].sum() == 0  # rest untouched


def test_backdoor_poison_counts_and_labels():
    ds = mock_dataset(100, seed=3)
    atk = get_attack("backdoor", {"poison_ratio": 0.2, "target_class": 0,
                                  "trigger_size": 3})
    poisoned = atk.poison_dataset(ds)
    assert atk.num_poisoned == 20
    assert (poisoned.labels[atk.poisoned_indices] == 0).all()
    # Trigger present at bottom_right for poisoned images.
    i = atk.poisoned_indices[0]
    np.testing.assert_array_equal(
        poisoned.arrays["image"][i, 24:27, 24:27, 0], atk.trigger
    )


def test_triggered_testset_excludes_target():
    ds = mock_dataset(100, seed=4)
    atk = get_attack("backdoor", {"target_class": 0})
    trig_ds = atk.create_poisoned_testset(ds)
    assert (trig_ds.labels != 0).all()  # reference: :175-187
    assert len(trig_ds) == int((ds.labels != 0).sum())
    # All samples carry the trigger.
    np.testing.assert_array_equal(
        trig_ds.arrays["image"][:, 24:27, 24:27, 0],
        np.broadcast_to(atk.trigger, (len(trig_ds), 3, 3)),
    )


def test_distributed_backdoor_parts_assemble():
    full = make_trigger("square", 4)
    cfg = {"trigger_size": 4, "num_parts": 2, "trigger_type": "square"}
    a0 = get_attack("distributed_backdoor", {**cfg, "part_id": 0})
    a1 = get_attack("distributed_backdoor", {**cfg, "part_id": 1})
    # Each part carries ONLY its band (at a band-shifted position), so
    # stacking the bands reassembles the full trigger.
    np.testing.assert_array_equal(np.vstack([a0.trigger, a1.trigger]), full)
    assert a0.trigger.shape == (2, 4)  # part 0 = top band
    assert a1.position[0] == a0.position[0] + 2


def test_distributed_backdoor_overpartition_patches_only_own_band():
    """num_parts > trigger rows: a part with an EMPTY band must patch
    NOTHING (the old zero-padded partial stamped a full black square),
    and the non-empty bands still cover the whole trigger."""
    from multimodal_fl_security_tpu.attacks.backdoor import apply_trigger

    cfg = {"trigger_size": 3, "num_parts": 4, "trigger_type": "square",
           "poison_ratio": 1.0, "target_class": 0}
    parts = [get_attack("distributed_backdoor", {**cfg, "part_id": p})
             for p in range(4)]
    rows = sorted((a.position[0], a.trigger.shape[0]) for a in parts)
    assert sum(h for _, h in rows) == 3  # bands tile the 3 trigger rows
    empty = [a for a in parts if a.trigger.shape[0] == 0]
    assert empty, "over-partitioning must yield an empty band"
    img = np.full((2, 28, 28, 1), 0.5, np.float32)
    out = apply_trigger(img, empty[0].trigger, empty[0].position)
    np.testing.assert_array_equal(out, img)  # empty band patches nothing


# --------------------------------------------------------- model poisoning ---
def _poison_ctx(rng, c=5, d=16):
    updates = jnp.asarray(rng.normal(0, 1, size=(c, d)).astype(np.float32))
    global_flat = jnp.zeros((d,), jnp.float32)
    mal = jnp.asarray(np.array([1, 0, 0, 0, 0], np.float32))
    return updates, global_flat, mal


def test_scaling_attack_exact(rng):
    updates, g, mal = _poison_ctx(rng)
    atk = get_attack("scaling", {"scale": 100.0})
    out = atk.poison_updates(jax.random.PRNGKey(0), updates, g, mal, 5)
    np.testing.assert_allclose(out[0], updates[0] * 100.0, rtol=1e-6)
    np.testing.assert_allclose(out[1:], updates[1:], rtol=1e-6)


def test_model_replacement_boosts_delta(rng):
    updates, g, mal = _poison_ctx(rng)
    atk = get_attack("model_replacement",
                     {"scale_factor": 2.0, "num_malicious": 1})
    out = atk.poison_updates(jax.random.PRNGKey(0), updates, g, mal, 5)
    # scale = (5/1)*2 = 10; global is zero so poisoned = 10 * update.
    np.testing.assert_allclose(out[0], updates[0] * 10.0, rtol=1e-5)
    np.testing.assert_allclose(out[1], updates[1], rtol=1e-6)


def test_adaptive_krum_lands_near_benign_center(rng):
    updates, g, mal = _poison_ctx(rng, d=64)
    atk = get_attack("adaptive_krum", {"perturbation_scale": 0.01})
    out = atk.poison_updates(jax.random.PRNGKey(0), updates, g, mal, 5)
    center = np.asarray(updates[1:]).mean(0)
    assert float(jnp.linalg.norm(out[0] - center)) < 0.5
    np.testing.assert_allclose(out[1:], updates[1:], rtol=1e-6)


def test_ipm_negative_inner_product(rng):
    updates, g, mal = _poison_ctx(rng, d=64)
    atk = get_attack("ipm", {"epsilon": 0.5})
    out = atk.poison_updates(jax.random.PRNGKey(0), updates, g, mal, 5)
    benign_mean = np.asarray(updates[1:]).mean(0)
    assert float(np.dot(np.asarray(out[0]), benign_mean)) < 0.0


# --------------------------------------------------------------- crossmodal ---
def test_attribute_poisoning_spec():
    ds = mock_dataset(100, with_attrs=True, seed=5)
    atk = get_attack("attribute_poisoning", {
        "target_class": 5, "poison_ratio": 0.2,
        "trigger_attributes": [0, 1, 2], "seed": 42,
    })
    poisoned = atk.poison_dataset(ds)
    assert atk.num_poisoned == 20  # spec: test_asr_crossmodal.py:233-246
    i = atk.poisoned_indices[0]
    assert poisoned.labels[i] == 5
    assert (poisoned.arrays["attributes"][i, [0, 1, 2]] == 1.0).all()


def test_attribute_poisoning_dual_trigger():
    ds = mock_dataset(10, with_attrs=True, seed=6)
    atk = get_attack("attribute_poisoning", {
        "target_class": 0, "poison_ratio": 1.0, "trigger_attributes": [0, 1],
        "dual_trigger": True, "image_trigger_size": 4,
    })
    poisoned = atk.poison_dataset(ds)
    img = poisoned.arrays["image"][0]
    assert img[-4:, -4:, :].mean() > 0.9  # spec: :271-287


def test_dual_modal_trigger_modes():
    ds = mock_dataset(40, with_attrs=True, seed=7)
    atk = get_attack("dual_modal_trigger", {
        "target_class": 0, "image_trigger_size": 4,
        "trigger_attributes": [0, 1, 2],
    })
    n_nontarget = int((ds.labels != 0).sum())
    for mode in ("both", "image", "attribute"):
        t = atk.create_triggered_test_set(ds, mode)
        assert len(t) == n_nontarget
    img_t = atk.create_triggered_test_set(ds, "image")
    assert img_t.arrays["image"][:, -4:, -4:, :].min() == 1.0
    np.testing.assert_array_equal(
        img_t.arrays["attributes"], ds.subset(ds.labels != 0).arrays["attributes"]
    )
    with pytest.raises(ValueError):
        atk.create_triggered_test_set(ds, "bogus")


def test_dual_modal_metrics():
    ds = mock_dataset(100, with_attrs=True, seed=8)
    atk = get_attack("dual_modal_trigger", {"target_class": 5,
                                            "poison_ratio": 0.15})
    atk.poison_dataset(ds)
    m = atk.get_metrics()
    assert m["attack_type"] == "dual_modal_trigger"
    assert m["target_class"] == 5
    assert m["num_poisoned"] == 15  # spec: :322-336


def test_registry_names_match_reference():
    from multimodal_fl_security_tpu.attacks.base import ATTACKS

    for name in ("none", "label_flip", "all_to_one", "backdoor",
                 "distributed_backdoor", "model_replacement", "adaptive_krum",
                 "scaling", "ipm", "attribute_poisoning", "dual_modal_trigger"):
        assert name in ATTACKS, name
