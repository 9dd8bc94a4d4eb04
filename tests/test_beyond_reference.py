"""Tests for the beyond-reference security plugins: Bulyan defense and the
Min-Max/Min-Sum AGR-agnostic attacks (neither exists in the reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_fl_security_tpu.attacks import get_attack
from multimodal_fl_security_tpu.defenses import get_defense


# ----------------------------------------------------------------- bulyan ---
def _benign_plus_outliers(rng, n_benign, n_out, d=16, loc=1.0):
    benign = rng.normal(loc, 0.05, size=(n_benign, d)).astype(np.float32)
    outl = 100.0 * np.ones((n_out, d), np.float32)
    return jnp.asarray(np.concatenate([benign, outl]))


def test_bulyan_rejects_outliers(rng):
    # n=7, f=1 satisfies n >= 4f+3; 1 actual outlier.
    updates = _benign_plus_outliers(rng, 6, 1)
    d = get_defense("bulyan", {"num_malicious": 1})
    agg, aux = d.aggregate_with_aux(updates, jnp.ones((7,)))
    assert float(jnp.max(jnp.abs(agg - 1.0))) < 0.2
    # The outlier (index 6) is never selected.
    assert float(aux["selected_mask"][6]) == 0.0
    assert int(aux["num_selected"]) == 7 - 2  # theta = n - 2f
    # Detection flags it.
    det = np.asarray(d.detect(updates, jnp.ones((7,))))
    assert det[6] == 1.0


def test_bulyan_guard_raises():
    d = get_defense("bulyan", {"num_malicious": 1})
    with pytest.raises(ValueError, match="4f"):
        d.aggregate_with_aux(jnp.zeros((6, 4)), jnp.ones((6,)))


def test_bulyan_clean_equals_near_mean(rng):
    """With homogeneous benign updates, Bulyan's output is within the
    benign spread (sanity against over-trimming)."""
    updates = jnp.asarray(rng.normal(2.0, 0.01, size=(8, 8)).astype(np.float32))
    d = get_defense("bulyan", {"num_malicious": 1})
    agg, _ = d.aggregate_with_aux(updates, jnp.ones((8,)))
    assert float(jnp.max(jnp.abs(agg - 2.0))) < 0.05


def test_bulyan_inside_jit(rng):
    updates = _benign_plus_outliers(rng, 6, 1)
    d = get_defense("bulyan", {"num_malicious": 1})
    agg = jax.jit(lambda u, w: d.aggregate_with_aux(u, w, {})[0])(
        updates, jnp.ones((7,)))
    assert float(jnp.max(jnp.abs(agg - 1.0))) < 0.2


# ------------------------------------------------------------- min-max/sum ---
def _make_updates(rng, n=10, d=32):
    return jnp.asarray(rng.normal(0.5, 0.3, size=(n, d)).astype(np.float32))


@pytest.mark.parametrize("name", ["min_max", "min_sum"])
def test_agr_attack_respects_constraint(rng, name):
    updates = _make_updates(rng)
    mal = jnp.zeros((10,)).at[jnp.array([0, 1])].set(1.0)
    atk = get_attack(name, {"perturbation": "std"})
    out = atk.poison_updates(jax.random.PRNGKey(0), updates,
                             jnp.zeros((32,)), mal, 10)
    out = np.asarray(out)
    ben = np.asarray(updates)[2:]
    crafted = out[0]
    np.testing.assert_allclose(out[1], crafted)       # colluders identical
    # Benign rows untouched.
    np.testing.assert_allclose(out[2:], ben)

    cd = np.linalg.norm(crafted[None, :] - ben, axis=1)
    bd = np.linalg.norm(ben[:, None, :] - ben[None, :, :], axis=2)
    if name == "min_max":
        assert cd.max() <= bd.max() * (1 + 1e-4)
    else:
        assert (cd ** 2).sum() <= (bd ** 2).sum(axis=1).max() * (1 + 1e-4)
    # And gamma actually moved the crafted point off the benign mean.
    mean = ben.mean(axis=0)
    assert np.linalg.norm(crafted - mean) > 1e-3


def test_min_max_evades_krum_detection(rng):
    """The crafted update sits inside the benign spread, so Krum's
    distance scoring cannot reliably exclude it — the attack's design
    goal (Shejwalkar'21 §IV)."""
    updates = _make_updates(rng, n=11)
    mal = jnp.zeros((11,)).at[0].set(1.0)
    atk = get_attack("min_max", {"perturbation": "std"})
    out = atk.poison_updates(jax.random.PRNGKey(0), updates,
                             jnp.zeros((32,)), mal, 11)
    d = get_defense("krum", {"num_malicious": 1})
    scores = np.asarray(d.scores(out))
    # The crafted update's Krum score is not the worst (an obvious scaled
    # attack WOULD be argmax); i.e. at least one benign client scores worse.
    assert scores[0] < scores.max()


def test_agr_attack_in_engine_round():
    """min_max fires inside the jitted round program end-to-end."""
    from helpers import tiny_config
    from multimodal_fl_security_tpu.experiments.runner import run_simulation

    res = run_simulation(tiny_config(
        "agr_e2e", num_rounds=2, num_clients=5,
        attack_enabled=True, attack_type="min_max",
        malicious_clients=[0],
        defense_enabled=True, defense_type="trimmed_mean", trim_ratio=0.2,
    ))
    assert np.isfinite(res.final_loss)


def test_registry_has_beyond_reference_names():
    from multimodal_fl_security_tpu.attacks.base import ATTACKS
    from multimodal_fl_security_tpu.defenses.base import DEFENSES

    assert "min_max" in ATTACKS and "min_sum" in ATTACKS
    assert "bulyan" in DEFENSES
    assert "dnc" in DEFENSES and "centered_clip" in DEFENSES
    assert "alie" in ATTACKS


# -------------------------------------------------------------- foolsgold ---
def test_foolsgold_downweights_colluders(rng):
    """Two sybils with near-identical histories get weight ~0; honest
    clients with diverse directions keep weight ~1."""
    d = get_defense("foolsgold", {})
    honest = rng.normal(0, 1.0, size=(4, 64)).astype(np.float32)
    sybil = rng.normal(0, 1.0, size=(1, 64)).astype(np.float32)
    sybils = np.concatenate([sybil, sybil + 1e-4])  # near-identical
    hist = jnp.asarray(np.concatenate([sybils, honest]))
    wv = np.asarray(d.weights_from_history(hist))
    assert wv[0] < 0.05 and wv[1] < 0.05
    assert (wv[2:] > 0.8).all()


def test_foolsgold_survives_all_negative_similarities():
    """Honest clients whose histories are pairwise ANTI-correlated (all
    cosines negative) must keep full weight — negative similarity is
    diversity, not collusion. (Regression: an unclamped negative maxcs
    in the pardoning ratio exploded to ~-maxcs/eps and zeroed every
    client's weight.)"""
    d = get_defense("foolsgold", {})
    # Three unit vectors at ~120 degrees pairwise in a 2-D subspace.
    hist = np.zeros((3, 8), np.float32)
    for i, ang in enumerate((0.0, 2.1, 4.2)):
        hist[i, 0], hist[i, 1] = np.cos(ang), np.sin(ang)
    wv = np.asarray(d.weights_from_history(jnp.asarray(hist)))
    assert (wv > 0.9).all(), wv


def test_dnc_requires_fresh_key():
    """A fixed coordinate draw would inspect the same coordinates every
    round (an adaptive attacker hides elsewhere) — fail loudly."""
    import pytest

    d = get_defense("dnc", {"num_malicious": 1})
    with pytest.raises(ValueError, match="key"):
        d.aggregate(jnp.ones((4, 32)), jnp.ones((4,)))


def test_foolsgold_stateful_in_engine():
    """History accumulates across rounds inside the engine; colluding
    backdoor clients are driven to ~zero aggregation weight."""
    import jax as _jax

    from multimodal_fl_security_tpu.data.datasets import load_dataset
    from multimodal_fl_security_tpu.data.partition import partition_data
    from multimodal_fl_security_tpu.data.stacking import stack_clients
    from multimodal_fl_security_tpu.models import create_model, init_model
    from multimodal_fl_security_tpu.rounds.engine import RoundEngine, TrainSpec

    train = load_dataset("synthetic", "train", num_train=320,
                         image_shape=(16, 16, 1))
    idx = partition_data(train.labels, 5, "iid")
    cd = stack_clients(train, idx, pad_multiple=16)
    model = create_model("simple_cnn", num_classes=10)
    sample = {k: v[0, :16] for k, v in cd.arrays.items()}
    params = init_model(model, sample, seed=0)["params"]
    eng = RoundEngine(model, cd, TrainSpec(batch_size=16),
                      attack=get_attack("scaling", {"scale": 5.0}),
                      defense=get_defense("foolsgold", {}),
                      malicious_clients=[0, 1])
    key = _jax.random.PRNGKey(0)
    for r in range(3):
        params, metrics = eng.run_round(params, _jax.random.fold_in(key, r))
    wv = np.asarray(metrics["fg_weights"])
    # The two colluders (identical scaled updates each round) share maximal
    # historical similarity -> near-zero weight.
    assert wv[0] < 0.1 and wv[1] < 0.1
    assert wv[2:].max() > 0.5
    # State persisted and is non-zero.
    assert float(jnp.abs(eng._defense_state).max()) > 0


def test_foolsgold_composes_with_client_subsampling():
    """Per-client history rows live on the full client axis; under
    clients_per_round < num_clients the round gathers the sampled rows
    and scatters them back — a client's history accumulates exactly
    across the rounds it participates in, and non-participants' rows are
    untouched."""
    import jax as _jax

    from multimodal_fl_security_tpu.data.datasets import load_dataset
    from multimodal_fl_security_tpu.data.partition import partition_data
    from multimodal_fl_security_tpu.data.stacking import stack_clients
    from multimodal_fl_security_tpu.models import create_model, init_model
    from multimodal_fl_security_tpu.rounds.engine import RoundEngine, TrainSpec

    num_clients, k = 6, 3
    train = load_dataset("synthetic", "train", num_train=384,
                         image_shape=(16, 16, 1))
    idx = partition_data(train.labels, num_clients, "iid")
    cd = stack_clients(train, idx, pad_multiple=16)
    model = create_model("simple_cnn", num_classes=10)
    sample = {k2: v[0, :16] for k2, v in cd.arrays.items()}
    params = init_model(model, sample, seed=0)["params"]
    eng = RoundEngine(model, cd, TrainSpec(batch_size=16),
                      defense=get_defense("foolsgold", {}),
                      clients_per_round=k)

    key = _jax.random.PRNGKey(0)
    prev_state = None
    participated = np.zeros(num_clients, bool)
    for r in range(3):
        rkey = _jax.random.fold_in(key, r)
        # Recompute the engine's sampling (engine.py round_fn).
        sample_idx = np.asarray(_jax.random.permutation(
            _jax.random.fold_in(rkey, 0x5A3), num_clients
        )[:k])
        params, metrics = eng.run_round(params, rkey)
        state = np.asarray(eng._defense_state)
        assert state.shape[0] == num_clients
        assert metrics["fg_weights"].shape == (k,)
        if prev_state is not None:
            changed = np.array([
                not np.array_equal(state[i], prev_state[i])
                for i in range(num_clients)
            ])
            assert changed[sample_idx].all(), "participant rows must update"
            non = np.setdiff1d(np.arange(num_clients), sample_idx)
            assert not changed[non].any(), "non-participant rows moved"
        participated[sample_idx] = True
        prev_state = state
    # Across 3 rounds of 3-of-6 sampling, every participant's row is
    # nonzero and never-sampled clients' rows are still exactly zero.
    norms = np.abs(prev_state).max(axis=1)
    assert (norms[participated] > 0).all()
    assert (norms[~participated] == 0).all()


def test_centered_clip_composes_with_client_subsampling():
    """Global [D] state defenses pass through subsampling unsliced."""
    import jax as _jax

    from multimodal_fl_security_tpu.data.datasets import load_dataset
    from multimodal_fl_security_tpu.data.partition import partition_data
    from multimodal_fl_security_tpu.data.stacking import stack_clients
    from multimodal_fl_security_tpu.models import create_model, init_model
    from multimodal_fl_security_tpu.rounds.engine import RoundEngine, TrainSpec

    train = load_dataset("synthetic", "train", num_train=256,
                         image_shape=(16, 16, 1))
    idx = partition_data(train.labels, 4, "iid")
    cd = stack_clients(train, idx, pad_multiple=16)
    model = create_model("simple_cnn", num_classes=10)
    sample = {k: v[0, :16] for k, v in cd.arrays.items()}
    params = init_model(model, sample, seed=0)["params"]
    eng = RoundEngine(model, cd, TrainSpec(batch_size=16),
                      defense=get_defense("centered_clip", {}),
                      clients_per_round=2)
    for r in range(2):
        params, metrics = eng.run_round(params, _jax.random.PRNGKey(r))
    assert np.isfinite(float(metrics["cclip_center_norm"]))


def test_foolsgold_e2e_crushes_colluding_backdoor():
    """The regime where trimmed-mean only reaches ASR ~0.38
    (artifacts/attack_efficacy): FoolsGold's historical-similarity
    weighting suppresses the 2/5-colluder backdoor."""
    from multimodal_fl_security_tpu.experiments.config import ExperimentConfig
    from multimodal_fl_security_tpu.experiments.runner import run_simulation

    base = dict(
        dataset="digits", num_clients=5, num_rounds=10, local_epochs=2,
        batch_size=32, learning_rate=0.01, partition="iid", seed=42,
        target_class=0, trigger_size=3,
        attack_enabled=True, attack_type="backdoor",
        poison_ratio=0.8, malicious_clients=[0, 1],
    )
    res = run_simulation(ExperimentConfig(
        name="fg_e2e", defense_enabled=True, defense_type="foolsgold",
        **base))
    assert res.attack_success_rate < 0.1
    assert res.final_accuracy > 0.8


# ------------------------------------------------------------------- alie ---
def test_alie_crafted_matches_mean_minus_z_std(rng):
    from multimodal_fl_security_tpu.attacks.alie import alie_z

    updates = _make_updates(rng, n=10, d=32)
    mal = jnp.zeros((10,)).at[jnp.array([0, 1])].set(1.0)
    atk = get_attack("alie", {"z": 1.5, "num_malicious": 2})
    out = np.asarray(atk.poison_updates(
        jax.random.PRNGKey(0), updates, jnp.zeros((32,)), mal, 10))
    ben = np.asarray(updates)[2:]
    want = ben.mean(axis=0) - 1.5 * ben.std(axis=0)
    np.testing.assert_allclose(out[0], want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out[1], out[0])        # colluders identical
    np.testing.assert_allclose(out[2:], ben)          # benign untouched
    # Derived z is positive and finite for the paper's regimes.
    assert 0.0 < alie_z(50, 12) < 3.0
    assert alie_z(10, 2) >= 0.0


def test_alie_stays_inside_benign_spread(rng):
    """The whole point of ALIE: the crafted update is NOT a distance
    outlier (Krum accepts it), unlike a scaling attack."""
    updates = _make_updates(rng, n=12, d=64)
    mal = jnp.zeros((12,)).at[jnp.array([0, 1, 2])].set(1.0)
    atk = get_attack("alie", {"num_malicious": 3})
    out = np.asarray(atk.poison_updates(
        jax.random.PRNGKey(0), updates, jnp.zeros((64,)), mal, 12))
    ben = out[3:]
    crafted = out[0]
    cd = np.linalg.norm(crafted[None] - ben, axis=1).max()
    bd = np.linalg.norm(ben[:, None] - ben[None], axis=2).max()
    assert cd < 1.5 * bd  # same scale as the benign pairwise spread


# ---------------------------------------------------------- centered clip ---
def test_centered_clip_passes_honest_updates(rng):
    updates = jnp.asarray(rng.normal(3.0, 0.01, (8, 16)).astype(np.float32))
    d = get_defense("centered_clip", {"tau": 10.0, "iters": 5})
    agg, _ = d.aggregate_with_aux(updates, jnp.ones((8,)),
                                  {"global": jnp.full((16,), 3.0)})
    np.testing.assert_allclose(np.asarray(agg),
                               np.asarray(updates).mean(0), atol=1e-3)


def test_centered_clip_bounds_outlier_bias(rng):
    """One 1000-scale outlier among 8 moves the center by at most
    tau * iters / n (paper's per-iteration bound)."""
    tau, iters, n = 1.0, 3, 8
    benign = rng.normal(0.0, 0.05, (n - 1, 16)).astype(np.float32)
    outl = 1000.0 * np.ones((1, 16), np.float32)
    updates = jnp.asarray(np.concatenate([benign, outl]))
    d = get_defense("centered_clip", {"tau": tau, "iters": iters})
    agg, _ = d.aggregate_with_aux(updates, jnp.ones((n,)),
                                  {"global": jnp.zeros((16,))})
    bias = float(jnp.linalg.norm(agg - jnp.asarray(benign.mean(0))))
    assert bias <= tau * iters / n + 0.1
    # Detection flags the outlier (it stays > tau from the center).
    det = np.asarray(d.detect(updates, jnp.ones((n,)),
                              {"global": jnp.zeros((16,))}))
    assert det[-1] == 1.0 and det[:-1].sum() == 0


def test_centered_clip_state_carries_across_rounds(rng):
    """aggregate_stateful warm-starts from the previous round's center."""
    d = get_defense("centered_clip", {"tau": 5.0, "iters": 5})
    updates = jnp.asarray(rng.normal(1.0, 0.01, (6, 8)).astype(np.float32))
    state = d.init_state(6, 8)
    agg1, _, state = d.aggregate_stateful(
        updates, jnp.ones((6,)), {"global": jnp.zeros((8,))}, state)
    np.testing.assert_allclose(np.asarray(state), np.asarray(agg1))
    # Second round: centers near 1.0 already; one iteration suffices.
    agg2, _, _ = d.aggregate_stateful(
        updates, jnp.ones((6,)), {"global": jnp.zeros((8,))}, state)
    np.testing.assert_allclose(np.asarray(agg2),
                               np.asarray(updates).mean(0), atol=1e-3)


def test_centered_clip_resists_alie_better_than_median(rng):
    """The pairing these plugins exist for (Karimireddy'21 §5): ALIE's
    coordinated small bias moves the coordinate median, while centered
    clipping bounds the drift."""
    n, dim = 10, 64
    benign = rng.normal(0.0, 1.0, (n - 4, dim)).astype(np.float32)
    updates0 = jnp.asarray(np.concatenate(
        [np.zeros((4, dim), np.float32), benign]))
    mal = jnp.zeros((n,)).at[jnp.arange(4)].set(1.0)
    atk = get_attack("alie", {"num_malicious": 4})
    updates = atk.poison_updates(jax.random.PRNGKey(1), updates0,
                                 jnp.zeros((dim,)), mal, n)
    true_mean = benign.mean(0)

    med, _ = get_defense("median").aggregate_with_aux(updates, jnp.ones((n,)))
    cc, _ = get_defense("centered_clip", {"tau": 2.0, "iters": 5}).\
        aggregate_with_aux(updates, jnp.ones((n,)),
                           {"global": jnp.asarray(true_mean)})
    med_err = float(np.linalg.norm(np.asarray(med) - true_mean))
    cc_err = float(np.linalg.norm(np.asarray(cc) - true_mean))
    assert cc_err < med_err


# --------------------------------------------------------------------- dnc ---
def test_dnc_filters_common_direction_colluders(rng):
    """Colluders shifted along ONE shared direction (the ALIE/Min-Max
    shape) project hugely onto the top singular vector and are removed,
    even though their norms are unremarkable."""
    d = 64
    benign = rng.normal(1.0, 0.05, size=(8, d)).astype(np.float32)
    direction = rng.normal(size=(d,)).astype(np.float32)
    direction /= np.linalg.norm(direction)
    crafted = benign.mean(0) - 1.5 * direction  # modest norm, common shift
    updates = jnp.asarray(np.concatenate([benign, crafted[None].repeat(2, 0)]))
    dfn = get_defense("dnc", {"num_malicious": 2, "niters": 3})
    det = np.asarray(dfn.detect(updates, jnp.ones((10,)),
                                {"key": jax.random.PRNGKey(5)}))
    assert det[8:].sum() == 2.0, det  # both colluders flagged
    agg, aux = dfn.aggregate_with_aux(updates, jnp.ones((10,)),
                                      {"key": jax.random.PRNGKey(5)})
    assert float(jnp.max(jnp.abs(agg - 1.0))) < 0.25
    assert float(aux["dnc_num_kept"]) <= 10 - 2


def test_dnc_clean_aggregate_near_mean(rng):
    updates = jnp.asarray(rng.normal(2.0, 0.05, size=(10, 32)).astype(np.float32))
    dfn = get_defense("dnc", {"num_malicious": 1, "niters": 2})
    agg, _ = dfn.aggregate_with_aux(updates, jnp.ones((10,)),
                                    {"key": jax.random.PRNGKey(0)})
    assert float(jnp.max(jnp.abs(agg - 2.0))) < 0.1


def test_dnc_inside_jit(rng):
    updates = jnp.asarray(rng.normal(size=(6, 40)).astype(np.float32))
    dfn = get_defense("dnc", {"num_malicious": 1, "sub_dim": 16})

    @jax.jit
    def run(u, k):
        return dfn.aggregate(u, jnp.ones((6,)), {"key": k})

    out = run(updates, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(out)).all()


def test_dnc_catches_colluders_under_lowrank_benign_variance(rng):
    """Real benign gradient noise is LOW-RANK (clients share loss
    geometry) — DnC's working assumption. With benign deviations in a
    5-dim subspace and colluders shifted along a fresh direction of
    comparable norm, the spectral filter must flag the colluders and
    beat the coordinate median's bias. (With ISOTROPIC high-dim benign
    noise the spectrum is flat and no spectral method can see the
    attack; verified while constructing this test.)"""
    d, k = 128, 5
    base = rng.normal(0.0, 1.0, size=(d,)).astype(np.float32)
    subspace = rng.normal(size=(k, d)).astype(np.float32)
    subspace /= np.linalg.norm(subspace, axis=1, keepdims=True)
    coef = rng.normal(0.0, 0.5, size=(7, k)).astype(np.float32)
    benign = base[None] + coef @ subspace
    direction = rng.normal(size=(d,)).astype(np.float32)
    direction /= np.linalg.norm(direction)
    crafted = (benign.mean(0) - 1.5 * direction)[None].repeat(3, 0)
    updates = jnp.asarray(np.concatenate([benign, crafted]))
    w = jnp.ones((10,))
    dfn = get_defense("dnc", {"num_malicious": 3, "niters": 3})
    det = np.asarray(dfn.detect(updates, w, {"key": jax.random.PRNGKey(2)}))
    assert det[7:].sum() >= 2.0, det  # most colluders caught
    agg_dnc, _ = dfn.aggregate_with_aux(updates, w,
                                        {"key": jax.random.PRNGKey(2)})
    agg_med = get_defense("median").aggregate(updates, w)
    mean = jnp.asarray(benign.mean(0))
    err_dnc = float(jnp.linalg.norm(agg_dnc - mean))
    err_med = float(jnp.linalg.norm(agg_med - mean))
    assert err_dnc < err_med, (err_dnc, err_med)
