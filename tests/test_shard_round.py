"""shard_map round over the 8-virtual-device mesh: collective-explicit
aggregation must match the single-device engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_fl_security_tpu.core.pytrees import flatten_tree
from multimodal_fl_security_tpu.data.datasets import load_dataset
from multimodal_fl_security_tpu.data.partition import partition_data
from multimodal_fl_security_tpu.data.stacking import stack_clients
from multimodal_fl_security_tpu.defenses import get_defense
from multimodal_fl_security_tpu.models import create_model, init_model
from multimodal_fl_security_tpu.parallel.mesh import make_mesh
from multimodal_fl_security_tpu.parallel.shard_round import make_sharded_round
from multimodal_fl_security_tpu.rounds.engine import (
    RoundEngine,
    TrainSpec,
    make_local_train_fn,
)


@pytest.fixture(scope="module")
def setup():
    train = load_dataset("synthetic", "train", num_train=512,
                         image_shape=(16, 16, 1))
    idx = partition_data(train.labels, 8, "iid")
    cd = stack_clients(train, idx, pad_multiple=16)
    model = create_model("simple_cnn", num_classes=10)
    params = init_model(model, {k: v[0, :16] for k, v in cd.arrays.items()},
                        seed=0)["params"]
    spec = TrainSpec(learning_rate=0.05, local_epochs=1, batch_size=16)
    lt = make_local_train_fn(model, spec, cd.max_samples)
    return train, cd, model, params, spec, lt


@pytest.mark.parametrize("defense_name,cfg", [
    ("fedavg", {}),
    ("krum", {"num_malicious": 1, "multi_k": 1}),
    ("median", {}),
])
def test_sharded_round_matches_engine(setup, defense_name, cfg):
    train, cd, model, params, spec, lt = setup
    mesh = make_mesh(8)
    defense = get_defense(defense_name, cfg)
    round_fn = make_sharded_round(lt, defense, mesh, num_clients=8)

    arrays = {k: jnp.asarray(v) for k, v in cd.arrays.items()}
    mask = jnp.asarray(cd.mask)
    counts = jnp.asarray(cd.counts.astype(np.float32))
    malicious = jnp.zeros((8,), jnp.float32)
    key = jax.random.PRNGKey(0)

    new_sharded, loss = round_fn(params, key, arrays, mask, counts, malicious)

    engine = RoundEngine(model, cd, spec, defense=get_defense(defense_name, cfg))
    new_engine, _ = engine.run_round(params, key)

    # Same client keys (engine folds key by global client index, the sharded
    # path reconstructs the same indices) -> identical training -> the
    # aggregates must agree to float tolerance.
    a = np.asarray(flatten_tree(new_sharded))
    b = np.asarray(flatten_tree(new_engine))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
    assert np.isfinite(float(loss))


@pytest.mark.parametrize("defense_name,cfg", [
    ("krum", {"num_malicious": 1, "multi_k": 1}),
    ("multi_krum", {"num_malicious": 1, "multi_k": 3}),
    ("trimmed_mean", {"trim_ratio": 0.2}),
    ("median", {}),
    ("geometric_median", {}),
    ("bulyan", {"num_malicious": 1}),
    ("gradient_clipping", {"clip_norm": 1.0}),
    ("norm_bounding", {"min_norm": 0.0, "max_norm": 100.0}),
])
def test_param_sharded_round_matches_engine(setup, defense_name, cfg):
    """D-sharded aggregation (all_to_all to [C, D/p] + Gram psum / local
    coordinate rules) must agree with the replicated single-device engine.
    The model's flat dim (151,306) is NOT divisible by 8, so the
    pad-to-shardable path is exercised too."""
    train, cd, model, params, spec, lt = setup
    mesh = make_mesh(8)
    defense = get_defense(defense_name, cfg)
    round_fn = make_sharded_round(lt, defense, mesh, num_clients=8,
                                  param_sharded=True)

    arrays = {k: jnp.asarray(v) for k, v in cd.arrays.items()}
    mask = jnp.asarray(cd.mask)
    counts = jnp.asarray(cd.counts.astype(np.float32))
    malicious = jnp.zeros((8,), jnp.float32)
    key = jax.random.PRNGKey(0)
    new_sharded, loss = round_fn(params, key, arrays, mask, counts, malicious)

    engine = RoundEngine(model, cd, spec, defense=get_defense(defense_name, cfg))
    new_engine, _ = engine.run_round(params, key)
    np.testing.assert_allclose(
        np.asarray(flatten_tree(new_sharded)),
        np.asarray(flatten_tree(new_engine)), rtol=2e-4, atol=2e-5,
    )
    assert np.isfinite(float(loss))


def test_param_sharded_two_level_mesh(setup):
    """param_sharded over a 2x4 (dcn x clients) mesh: the all_to_all and
    Gram psum span both axes and must match the flat-mesh result."""
    train, cd, model, params, spec, lt = setup
    arrays = {k: jnp.asarray(v) for k, v in cd.arrays.items()}
    mask = jnp.asarray(cd.mask)
    counts = jnp.asarray(cd.counts.astype(np.float32))
    malicious = jnp.zeros((8,), jnp.float32)
    key = jax.random.PRNGKey(3)

    mesh2 = make_mesh(8, axis_names=("dcn", "clients"), shape=(2, 4))
    round2 = make_sharded_round(
        lt, get_defense("krum", {"num_malicious": 1}), mesh2, num_clients=8,
        axis=("dcn", "clients"), param_sharded=True)
    new2, _ = round2(params, key, arrays, mask, counts, malicious)

    mesh1 = make_mesh(8)
    round1 = make_sharded_round(
        lt, get_defense("krum", {"num_malicious": 1}), mesh1, num_clients=8,
        param_sharded=True)
    new1, _ = round1(params, key, arrays, mask, counts, malicious)
    np.testing.assert_allclose(
        np.asarray(flatten_tree(new2)), np.asarray(flatten_tree(new1)),
        rtol=2e-4, atol=2e-5,
    )


def test_param_sharded_fallback_for_unsupported_rule(setup):
    """A stateless rule with no D-sharded formulation (dnc) silently uses
    the row-replicated all_gather path and still matches the engine (the
    defense-key derivation is shared, so even its random coordinate
    draws agree)."""
    train, cd, model, params, spec, lt = setup
    mesh = make_mesh(8)
    cfg = {"num_malicious": 1, "sub_dim": 512}
    round_fn = make_sharded_round(lt, get_defense("dnc", cfg), mesh,
                                  num_clients=8, param_sharded=True)
    arrays = {k: jnp.asarray(v) for k, v in cd.arrays.items()}
    mask = jnp.asarray(cd.mask)
    counts = jnp.asarray(cd.counts.astype(np.float32))
    malicious = jnp.zeros((8,), jnp.float32)
    key = jax.random.PRNGKey(0)
    new_sharded, _ = round_fn(params, key, arrays, mask, counts, malicious)

    engine = RoundEngine(model, cd, spec, defense=get_defense("dnc", cfg))
    new_engine, _ = engine.run_round(params, key)
    np.testing.assert_allclose(
        np.asarray(flatten_tree(new_sharded)),
        np.asarray(flatten_tree(new_engine)), rtol=2e-4, atol=2e-5,
    )


def test_stateful_defense_rejected(setup):
    """The explicit sharded round does not thread defense state; it must
    refuse stateful defenses instead of silently resetting their history
    every round (use RoundEngine(mesh=...) for those)."""
    train, cd, model, params, spec, lt = setup
    mesh = make_mesh(8)
    with pytest.raises(ValueError, match="state"):
        make_sharded_round(lt, get_defense("foolsgold", {}), mesh,
                           num_clients=8)


def test_two_level_mesh_dcn_by_ici(setup):
    """2x4 (dcn x clients) mesh: reductions span both axes and match the
    flat 8-device result."""
    train, cd, model, params, spec, lt = setup
    mesh2 = make_mesh(8, axis_names=("dcn", "clients"), shape=(2, 4))
    defense = get_defense("median")
    round_fn = make_sharded_round(lt, defense, mesh2, num_clients=8,
                                  axis=("dcn", "clients"))
    arrays = {k: jnp.asarray(v) for k, v in cd.arrays.items()}
    mask = jnp.asarray(cd.mask)
    counts = jnp.asarray(cd.counts.astype(np.float32))
    malicious = jnp.zeros((8,), jnp.float32)
    key = jax.random.PRNGKey(0)
    new2, loss2 = round_fn(params, key, arrays, mask, counts, malicious)

    mesh1 = make_mesh(8)
    round1 = make_sharded_round(lt, get_defense("median"), mesh1,
                                num_clients=8)
    new1, loss1 = round1(params, key, arrays, mask, counts, malicious)
    np.testing.assert_allclose(
        np.asarray(flatten_tree(new2)), np.asarray(flatten_tree(new1)),
        rtol=2e-4, atol=2e-5,
    )
    assert abs(float(loss2) - float(loss1)) < 1e-4


def test_sharded_round_with_attack_matches_engine(setup):
    """Model poisoning inside the sharded round: the masked [C,D] transform
    must behave identically to the engine path."""
    from multimodal_fl_security_tpu.attacks import get_attack

    train, cd, model, params, spec, lt = setup
    mesh = make_mesh(8)
    attack = get_attack("scaling", {"scale": 30.0})
    defense = get_defense("trimmed_mean", {"trim_ratio": 0.2})
    round_fn = make_sharded_round(lt, defense, mesh, num_clients=8,
                                  attack=attack)

    arrays = {k: jnp.asarray(v) for k, v in cd.arrays.items()}
    mask = jnp.asarray(cd.mask)
    counts = jnp.asarray(cd.counts.astype(np.float32))
    malicious = jnp.zeros((8,), jnp.float32).at[0].set(1.0)
    key = jax.random.PRNGKey(5)
    new_sharded, _ = round_fn(params, key, arrays, mask, counts, malicious)

    engine = RoundEngine(model, cd, spec, attack=attack,
                         defense=get_defense("trimmed_mean",
                                             {"trim_ratio": 0.2}),
                         malicious_clients=[0])
    new_engine, _ = engine.run_round(params, key)
    np.testing.assert_allclose(
        np.asarray(flatten_tree(new_sharded)),
        np.asarray(flatten_tree(new_engine)), rtol=2e-4, atol=2e-5,
    )


def test_statistics_attack_matches_engine(setup):
    """ALIE crafts from the benign mean/std over ALL clients and all
    colluders emit one shared vector: the sharded round must apply the
    attack to the GATHERED matrix (per-shard application would craft
    from each shard's 1-client 'benign sample' — a different attack)."""
    from multimodal_fl_security_tpu.attacks import get_attack

    train, cd, model, params, spec, lt = setup
    mesh = make_mesh(8)
    attack = get_attack("alie", {"num_malicious": 2})
    defense = get_defense("krum", {"num_malicious": 2, "multi_k": 1})
    round_fn = make_sharded_round(lt, defense, mesh, num_clients=8,
                                  attack=attack)

    arrays = {k: jnp.asarray(v) for k, v in cd.arrays.items()}
    mask = jnp.asarray(cd.mask)
    counts = jnp.asarray(cd.counts.astype(np.float32))
    malicious = jnp.zeros((8,), jnp.float32).at[0].set(1.0).at[3].set(1.0)
    key = jax.random.PRNGKey(7)
    new_sharded, _ = round_fn(params, key, arrays, mask, counts, malicious)

    engine = RoundEngine(
        model, cd, spec, attack=get_attack("alie", {"num_malicious": 2}),
        defense=get_defense("krum", {"num_malicious": 2, "multi_k": 1}),
        malicious_clients=[0, 3],
    )
    new_engine, _ = engine.run_round(params, key)
    np.testing.assert_allclose(
        np.asarray(flatten_tree(new_sharded)),
        np.asarray(flatten_tree(new_engine)), rtol=2e-4, atol=2e-5,
    )


@pytest.mark.slow
def test_realistic_scale_mesh_matches_engine():
    """VERDICT r3 #7: realistic shapes on the 8-virtual-device mesh —
    C=128 clients, Dirichlet(0.3)-ragged shards, 32-client subsampling
    per round, and a STATEFUL per-client defense (FoolsGold) — must
    track the single-device engine exactly across 3 rounds (state
    threading included)."""
    train = load_dataset("synthetic", "train", num_train=4096,
                         image_shape=(16, 16, 1))
    idx = partition_data(train.labels, 128, "dirichlet", alpha=0.3, seed=42)
    sizes = sorted(len(v) for v in idx)
    assert sizes[0] < sizes[-1], "dirichlet shards should be ragged"
    cd = stack_clients(train, idx, pad_multiple=16)
    model = create_model("simple_cnn", num_classes=10)
    params = init_model(model, {k: v[0, :16] for k, v in cd.arrays.items()},
                        seed=0)["params"]
    spec = TrainSpec(learning_rate=0.05, local_epochs=1, batch_size=16)

    def run(mesh):
        engine = RoundEngine(
            model, cd, spec, defense=get_defense("foolsgold", {}),
            clients_per_round=32, mesh=mesh)
        p = params
        losses = []
        for r in range(3):
            p, metrics = engine.run_round(p, jax.random.PRNGKey(100 + r))
            losses.append(float(metrics["client_loss_mean"]))
        return p, losses

    p_mesh, loss_mesh = run(make_mesh(8))
    p_one, loss_one = run(None)
    np.testing.assert_allclose(
        np.asarray(flatten_tree(p_mesh)), np.asarray(flatten_tree(p_one)),
        rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(loss_mesh, loss_one, rtol=1e-4)


@pytest.mark.slow
def test_realistic_scale_two_level_mesh():
    """Same realistic workload over a 2x4 (dcn x clients) two-level mesh:
    RoundEngine's sharding spans both axes and must match the flat mesh."""
    train = load_dataset("synthetic", "train", num_train=2048,
                         image_shape=(16, 16, 1))
    idx = partition_data(train.labels, 64, "dirichlet", alpha=0.3, seed=7)
    cd = stack_clients(train, idx, pad_multiple=16)
    model = create_model("simple_cnn", num_classes=10)
    params = init_model(model, {k: v[0, :16] for k, v in cd.arrays.items()},
                        seed=0)["params"]
    spec = TrainSpec(learning_rate=0.05, local_epochs=1, batch_size=16)

    def run(mesh):
        engine = RoundEngine(model, cd, spec,
                             defense=get_defense("krum",
                                                 {"num_malicious": 6}),
                             clients_per_round=16, mesh=mesh)
        p, _ = engine.run_round(params, jax.random.PRNGKey(11))
        return p

    p2 = run(make_mesh(8, axis_names=("dcn", "clients"), shape=(2, 4)))
    p1 = run(make_mesh(8))
    np.testing.assert_allclose(
        np.asarray(flatten_tree(p2)), np.asarray(flatten_tree(p1)),
        rtol=2e-4, atol=2e-5)
