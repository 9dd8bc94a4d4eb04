"""Checkpoint/resume + FLTrust end-to-end tests (tiny shared shapes)."""

import dataclasses

import numpy as np

from helpers import tiny_config
from multimodal_fl_security_tpu.experiments.runner import run_simulation


def test_checkpoint_save_and_resume(tmp_path):
    base = tiny_config(
        "ckpt_exp", num_rounds=2,
        checkpoint_dir=str(tmp_path), checkpoint_every=1,
    )
    first = run_simulation(base)
    assert len(first.round_accuracies) == 2

    # Extend to 3 rounds with resume: rounds 1-2 come from the checkpoint,
    # only round 3 runs. Resumed curve must preserve the prefix.
    extended = dataclasses.replace(base, num_rounds=3,
                                   resume_from_checkpoint=True)
    second = run_simulation(extended)
    assert len(second.round_accuracies) == 3
    np.testing.assert_allclose(second.round_accuracies[:2],
                               first.round_accuracies, rtol=1e-6)
    assert second.final_accuracy >= first.final_accuracy - 0.05


def test_checkpoint_roundtrip_params(tmp_path):
    import jax
    import jax.numpy as jnp

    from multimodal_fl_security_tpu.utils.checkpoint import (
        latest_round,
        restore_checkpoint,
        save_checkpoint,
    )

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}
    key = jax.random.PRNGKey(7)
    save_checkpoint(str(tmp_path / "c"), 5, params, key,
                    extra={"round_accuracies": [0.5]})
    assert latest_round(str(tmp_path / "c")) == 5
    r, restored, rkey, extra = restore_checkpoint(str(tmp_path / "c"), params)
    assert r == 5
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.asarray(params["w"]))
    assert extra["round_accuracies"] == [0.5]


def test_fltrust_end_to_end():
    """FLTrust with its root-dataset server training inside the round —
    the path that CRASHES in the reference simulation (SURVEY.md §2.9-3)."""
    res = run_simulation(tiny_config(
        "fltrust_e2e", num_rounds=2,
        attack_enabled=True, attack_type="scaling",
        malicious_clients=[0], attack_params={"scale": 50.0},
        defense_enabled=True, defense_type="fltrust",
        defense_params={"root_dataset_size": 64},
    ))
    assert len(res.round_accuracies) == 2
    assert np.isfinite(res.final_loss)
    # FLTrust should keep the model sane despite the 50x scaling attacker
    # (plain FedAvg diverges badly in the same setup).
    assert res.final_accuracy > 0.12
