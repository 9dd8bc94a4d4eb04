"""Server optimizers (FedAvgM/FedAdagrad/FedAdam/FedYogi) and FedProx.

Beyond-reference capability (the reference's server always replaces the
global with the aggregate, run_experiments.py:256-259, and its clients
train plain local SGD): golden-value math checks against a numpy
re-derivation, engine state threading, and an end-to-end simulation.
"""

import numpy as np
import pytest

from multimodal_fl_security_tpu.rounds.server_opt import (
    ServerOptimizer,
    make_server_optimizer,
)

from helpers import tiny_config


# ---------------------------------------------------------------------------
# unit: factory
# ---------------------------------------------------------------------------
def test_factory_none_and_unknown():
    assert make_server_optimizer("none") is None
    assert make_server_optimizer("") is None
    assert make_server_optimizer(None) is None
    with pytest.raises(ValueError):
        make_server_optimizer("sgd_server")
    assert make_server_optimizer("fedadam").name == "fedadam"


# ---------------------------------------------------------------------------
# unit: golden-value math vs a numpy re-derivation (two steps)
# ---------------------------------------------------------------------------
def _numpy_reference(name, deltas, lr, b1, b2, tau, x0):
    x = x0.astype(np.float64).copy()
    m = np.zeros_like(x)
    v = np.full_like(x, tau**2)
    for d in deltas:
        d = d.astype(np.float64)
        if name == "fedavgm":
            m = b1 * m + d
            x = x + lr * m
            continue
        m = b1 * m + (1 - b1) * d
        if name == "fedadagrad":
            v = v + d * d
        elif name == "fedadam":
            v = b2 * v + (1 - b2) * d * d
        else:  # fedyogi
            v = v - (1 - b2) * d * d * np.sign(v - d * d)
        x = x + lr * m / (np.sqrt(v) + tau)
    return x


@pytest.mark.parametrize(
    "name", ["fedavgm", "fedadagrad", "fedadam", "fedyogi"]
)
def test_two_steps_match_numpy(name):
    rng = np.random.RandomState(0)
    x0 = rng.randn(32).astype(np.float32)
    deltas = [rng.randn(32).astype(np.float32) * 0.1 for _ in range(2)]
    lr, b1, b2, tau = 0.05, 0.9, 0.99, 1e-3
    opt = ServerOptimizer(
        name, {"server_lr": lr, "beta1": b1, "beta2": b2, "tau": tau}
    )
    state = opt.init_state(32)
    x = x0
    for d in deltas:
        x, state = opt.apply(x, x + d, state)  # aggregate = global + delta
    expected = _numpy_reference(name, deltas, lr, b1, b2, tau, x0)
    np.testing.assert_allclose(np.asarray(x), expected, rtol=2e-5, atol=2e-6)


def test_yogi_denominator_grows_slower_than_adagrad_shrinks_steps():
    """Adagrad's v only accumulates, so its steps shrink monotonically;
    Yogi's sign update lets v shrink again after a large transient."""
    big = np.full((4,), 10.0, np.float32)
    small = np.full((4,), 0.01, np.float32)
    x0 = np.zeros((4,), np.float32)

    def steps(name):
        opt = ServerOptimizer(name, {"server_lr": 1.0})
        st = opt.init_state(4)
        x = x0
        sizes = []
        for d in [big, small, small, small]:
            nx, st = opt.apply(x, x + d, st)
            sizes.append(float(np.abs(np.asarray(nx - x)).mean()))
            x = nx
        return sizes

    ada, yogi = steps("fedadagrad"), steps("fedyogi")
    # After the big transient, yogi's v decays back toward the small
    # delta's scale, so its later steps recover; adagrad's cannot.
    assert yogi[-1] > ada[-1]


# ---------------------------------------------------------------------------
# engine: state threads across run_round dispatches
# ---------------------------------------------------------------------------
def test_engine_threads_server_opt_state():
    import jax

    from multimodal_fl_security_tpu.data.datasets import load_dataset
    from multimodal_fl_security_tpu.data.partition import partition_data
    from multimodal_fl_security_tpu.data.stacking import stack_clients
    from multimodal_fl_security_tpu.models import create_model, init_model
    from multimodal_fl_security_tpu.rounds.engine import RoundEngine, TrainSpec

    train = load_dataset("synthetic", "train", num_train=256, num_test=64,
                         image_shape=(16, 16, 1))
    idx = partition_data(train.labels, 4, "iid")
    cd = stack_clients(train, idx, pad_multiple=16)
    model = create_model("simple_cnn", num_classes=10)
    sample = {k: v[0, :16] for k, v in cd.arrays.items()}
    params = init_model(model, sample, seed=0)["params"]

    opt = make_server_optimizer("fedadam", {"server_lr": 0.1})
    engine = RoundEngine(
        model, cd, TrainSpec(batch_size=16, local_epochs=1), server_opt=opt
    )
    p1, _ = engine.run_round(params, jax.random.PRNGKey(0))
    m1 = np.asarray(engine._server_opt_state["m"]).copy()
    assert np.abs(m1).max() > 0.0, "first round must move the momentum"
    p2, _ = engine.run_round(p1, jax.random.PRNGKey(1))
    m2 = np.asarray(engine._server_opt_state["m"])
    assert np.abs(m2 - m1).max() > 0.0, "state must evolve across rounds"
    assert np.isfinite(np.asarray(engine._server_opt_state["v"])).all()


# ---------------------------------------------------------------------------
# FedProx: a huge mu pins local training to the global
# ---------------------------------------------------------------------------
def test_fedprox_large_mu_anchors_local_training():
    import jax
    import jax.numpy as jnp

    from multimodal_fl_security_tpu.core.pytrees import flatten_tree
    from multimodal_fl_security_tpu.data.datasets import load_dataset
    from multimodal_fl_security_tpu.models import create_model, init_model
    from multimodal_fl_security_tpu.rounds.engine import (
        TrainSpec,
        make_local_train_fn,
    )

    train = load_dataset("synthetic", "train", num_train=64, num_test=16,
                         image_shape=(16, 16, 1))
    model = create_model("simple_cnn", num_classes=10)
    data = {k: jnp.asarray(v[:64]) for k, v in train.arrays.items()}
    mask = jnp.ones((64,), jnp.float32)
    sample = {k: v[:16] for k, v in train.arrays.items()}
    params = init_model(model, sample, seed=0)["params"]
    key = jax.random.PRNGKey(3)

    def drift(mu):
        spec = TrainSpec(learning_rate=0.05, batch_size=16, local_epochs=1,
                         fedprox_mu=mu)
        fn = make_local_train_fn(model, spec, 64)
        new_params, loss = fn(params, data, mask, key)
        assert np.isfinite(float(loss))
        return float(
            jnp.linalg.norm(flatten_tree(new_params) - flatten_tree(params))
        )

    free, pinned = drift(0.0), drift(1e4)
    # Global-norm clipping (1.0) bounds the proximal pull per step, so the
    # pinned drift is small but not arbitrarily small: observed ~17x less.
    assert pinned < free * 0.2, (free, pinned)


# ---------------------------------------------------------------------------
# e2e: simulation accepts the new config fields and still learns
# ---------------------------------------------------------------------------
def test_simulation_with_fedavgm_and_fedprox_learns():
    from multimodal_fl_security_tpu.experiments.runner import run_simulation

    cfg = tiny_config(
        "fedavgm_prox", num_rounds=3, fedprox_mu=0.01,
        server_optimizer="fedavgm",
        server_opt_params={"server_lr": 1.0, "beta1": 0.9},
    )
    res = run_simulation(cfg)
    assert res.round_accuracies[-1] > 0.3, res.round_accuracies
    assert np.isfinite(res.final_loss)


# ---------------------------------------------------------------------------
# client chunking: identical math, bounded compile
# ---------------------------------------------------------------------------
def test_chunked_round_matches_unchunked():
    import jax

    from multimodal_fl_security_tpu.core.pytrees import flatten_tree
    from multimodal_fl_security_tpu.data.datasets import load_dataset
    from multimodal_fl_security_tpu.data.partition import partition_data
    from multimodal_fl_security_tpu.data.stacking import stack_clients
    from multimodal_fl_security_tpu.models import create_model, init_model
    from multimodal_fl_security_tpu.rounds.engine import RoundEngine, TrainSpec

    train = load_dataset("synthetic", "train", num_train=512, num_test=64,
                         image_shape=(16, 16, 1))
    idx = partition_data(train.labels, 8, "iid")
    cd = stack_clients(train, idx, pad_multiple=16)
    model = create_model("simple_cnn", num_classes=10)
    sample = {k: v[0, :16] for k, v in cd.arrays.items()}
    params = init_model(model, sample, seed=0)["params"]
    spec = TrainSpec(batch_size=16, local_epochs=1)

    full = RoundEngine(model, cd, spec)
    chunked = RoundEngine(model, cd, spec, client_chunk=4)
    key = jax.random.PRNGKey(9)
    p1, m1 = full.run_round(params, key)
    p2, m2 = chunked.run_round(params, key)
    np.testing.assert_allclose(
        np.asarray(flatten_tree(p1)), np.asarray(flatten_tree(p2)),
        rtol=2e-5, atol=2e-6,
    )
    np.testing.assert_allclose(float(m1["client_loss_mean"]),
                               float(m2["client_loss_mean"]), rtol=1e-5)


def test_client_chunk_must_divide():
    import pytest as _pytest

    from multimodal_fl_security_tpu.data.datasets import load_dataset
    from multimodal_fl_security_tpu.data.partition import partition_data
    from multimodal_fl_security_tpu.data.stacking import stack_clients
    from multimodal_fl_security_tpu.models import create_model
    from multimodal_fl_security_tpu.rounds.engine import RoundEngine, TrainSpec

    train = load_dataset("synthetic", "train", num_train=256, num_test=64,
                         image_shape=(16, 16, 1))
    idx = partition_data(train.labels, 6, "iid")
    cd = stack_clients(train, idx, pad_multiple=16)
    model = create_model("simple_cnn", num_classes=10)
    with _pytest.raises(ValueError, match="divide"):
        RoundEngine(model, cd, TrainSpec(batch_size=16), client_chunk=4)


def test_detect_malicious_chunked_matches_full():
    """detect_malicious must run the same chunk-bounded program as the
    round (a C-wide vmap at C>=200 is a multi-minute compile on the
    tunneled service — the chunk exists to bound it)."""
    import jax

    from multimodal_fl_security_tpu.data.datasets import load_dataset
    from multimodal_fl_security_tpu.data.partition import partition_data
    from multimodal_fl_security_tpu.data.stacking import stack_clients
    from multimodal_fl_security_tpu.defenses import get_defense
    from multimodal_fl_security_tpu.models import create_model, init_model
    from multimodal_fl_security_tpu.rounds.engine import RoundEngine, TrainSpec

    train = load_dataset("synthetic", "train", num_train=512, num_test=64,
                         image_shape=(16, 16, 1))
    idx = partition_data(train.labels, 8, "iid")
    cd = stack_clients(train, idx, pad_multiple=16)
    model = create_model("simple_cnn", num_classes=10)
    sample = {k: v[0, :16] for k, v in cd.arrays.items()}
    params = init_model(model, sample, seed=0)["params"]
    spec = TrainSpec(batch_size=16, local_epochs=1)

    def build(chunk):
        return RoundEngine(
            model, cd, spec, defense=get_defense("krum", {"num_malicious": 2}),
            malicious_clients=[1, 5], client_chunk=chunk,
        )

    key = jax.random.PRNGKey(3)
    full = build(None).detect_malicious(params, key)
    chunked = build(4).detect_malicious(params, key)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(chunked))
