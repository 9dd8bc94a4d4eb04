"""Defense unit tests.

Mirrors the reference's property-style strategy (reference:
tests/test_defenses.py): outliers must lose under robust rules, guards must
raise, DP must clip and add noise — plus golden-value aggregation tests the
reference lacked (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_fl_security_tpu.defenses import get_defense
from multimodal_fl_security_tpu.ops.reductions import (
    coordinate_median,
    geometric_median,
    trimmed_mean,
    weighted_mean,
)
from multimodal_fl_security_tpu.ops.pairwise import pairwise_dists


def make_updates(rng, n, d, loc=0.0, scale=1.0):
    return jnp.asarray(rng.normal(loc, scale, size=(n, d)).astype(np.float32))


# ---------------------------------------------------------------- fedavg ---
def test_fedavg_weighted_mean_golden():
    updates = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    weights = jnp.array([1.0, 3.0])
    agg = get_defense("fedavg").aggregate(updates, weights)
    np.testing.assert_allclose(agg, [2.5, 3.5], rtol=1e-6)


# ------------------------------------------------------------------ krum ---
def test_krum_selects_inlier_over_outlier(rng):
    base = rng.normal(0, 0.1, size=(4, 64)).astype(np.float32)
    outlier = 100.0 * np.ones((1, 64), np.float32)
    updates = jnp.asarray(np.concatenate([base, outlier]))
    weights = jnp.ones((5,))
    d = get_defense("krum", {"num_malicious": 1, "multi_k": 1})
    agg, aux = d.aggregate_with_aux(updates, weights)
    # The 100-scale outlier must not be selected (reference:
    # test_defenses.py:65-81).
    assert float(aux["selected_mask"][4]) == 0.0
    assert float(jnp.max(jnp.abs(agg))) < 1.0


def test_krum_requires_enough_clients(rng):
    updates = make_updates(rng, 4, 8)
    d = get_defense("krum", {"num_malicious": 1})
    with pytest.raises(ValueError, match="2f"):
        d.aggregate(updates, jnp.ones((4,)))


def test_multi_krum_averages_k(rng):
    updates = make_updates(rng, 7, 16)
    d = get_defense("multi_krum", {"num_malicious": 1, "multi_k": 3})
    agg, aux = d.aggregate_with_aux(updates, jnp.ones((7,)))
    sel = np.where(np.asarray(aux["selected_mask"]) > 0)[0]
    assert len(sel) == 3
    np.testing.assert_allclose(
        agg, jnp.mean(updates[sel], axis=0), rtol=1e-5, atol=1e-6
    )


def test_krum_matches_reference_algorithm(rng):
    """Golden cross-check against a direct numpy transcription of the
    published Krum rule (score = sum of n-f-2 nearest L2 distances)."""
    n, f, d = 8, 2, 32
    updates = rng.normal(0, 1, size=(n, d)).astype(np.float32)
    dist = np.sqrt(((updates[:, None] - updates[None, :]) ** 2).sum(-1))
    scores = np.sort(dist, axis=1)[:, 1 : n - f - 2 + 1].sum(1)
    expected = int(np.argmin(scores))

    kd = get_defense("krum", {"num_malicious": f, "multi_k": 1})
    _, aux = kd.aggregate_with_aux(jnp.asarray(updates), jnp.ones((n,)))
    assert int(aux["selected_first"]) == expected
    np.testing.assert_allclose(
        np.asarray(aux["krum_scores"]), scores, rtol=1e-4, atol=1e-4
    )


def test_pairwise_dists_accuracy(rng):
    u = rng.normal(0, 1, size=(6, 100)).astype(np.float32) + 50.0  # big norms
    d_ours = np.asarray(pairwise_dists(jnp.asarray(u)))
    d_ref = np.sqrt(((u[:, None] - u[None, :]) ** 2).sum(-1))
    np.testing.assert_allclose(d_ours, d_ref, rtol=1e-4, atol=1e-3)


# ---------------------------------------------------------- trimmed mean ---
def test_trimmed_mean_suppresses_outliers(rng):
    base = rng.normal(0, 0.5, size=(5, 32)).astype(np.float32)
    out = np.concatenate([base, 100 * np.ones((1, 32), np.float32),
                          -100 * np.ones((1, 32), np.float32)])
    agg = get_defense("trimmed_mean", {"trim_ratio": 0.2}).aggregate(
        jnp.asarray(out), jnp.ones((7,))
    )
    assert float(jnp.max(jnp.abs(agg))) < 1.5  # reference: :112-129


def test_trimmed_mean_golden():
    updates = jnp.array([[1.0], [2.0], [3.0], [4.0], [100.0]])
    # C=5, ratio .2 -> trim 1 per end -> mean(2,3,4) = 3
    agg = trimmed_mean(updates, 0.2)
    np.testing.assert_allclose(agg, [3.0])


def test_trimmed_mean_overtrim_falls_back_to_median():
    updates = jnp.array([[1.0], [2.0], [9.0]])
    # C=3, ratio .4 -> t=1, 2t<3 ok; ratio .5 -> t=1 still; use C=2:
    updates2 = jnp.array([[1.0], [9.0]])
    agg = trimmed_mean(updates2, 0.5)  # t=1, 2t>=2 -> median (lower middle)
    np.testing.assert_allclose(agg, [1.0])


# ---------------------------------------------------------------- median ---
def test_median_lower_middle_convention():
    updates = jnp.array([[1.0], [2.0], [3.0], [10.0]])
    # torch.median of even count returns the LOWER middle: 2.0 (not 2.5).
    np.testing.assert_allclose(coordinate_median(updates), [2.0])


def test_median_resists_single_outlier(rng):
    base = rng.normal(0, 0.1, size=(4, 16)).astype(np.float32)
    out = np.concatenate([base, 1000 * np.ones((1, 16), np.float32)])
    agg = get_defense("median").aggregate(jnp.asarray(out), jnp.ones((5,)))
    assert float(jnp.max(jnp.abs(agg))) < 1.0


# ------------------------------------------------------ geometric median ---
def test_geometric_median_converges(rng):
    pts = rng.normal(3.0, 0.2, size=(9, 8)).astype(np.float32)
    gm = geometric_median(jnp.asarray(pts))
    assert float(jnp.max(jnp.abs(gm - 3.0))) < 0.5


def test_geometric_median_robust_to_outlier(rng):
    pts = np.concatenate([
        rng.normal(0, 0.1, size=(6, 8)).astype(np.float32),
        500 * np.ones((1, 8), np.float32),
    ])
    gm = geometric_median(jnp.asarray(pts))
    assert float(jnp.max(jnp.abs(gm))) < 1.0


# ---------------------------------------------------------------- dp-sgd ---
def test_dp_sgd_clips_and_noises(rng):
    updates = jnp.asarray(rng.normal(0, 10, size=(4, 64)).astype(np.float32))
    d = get_defense("dp_sgd", {"clip_norm": 1.0, "noise_multiplier": 0.1})
    agg1 = d.aggregate(updates, jnp.ones((4,)), {"key": jax.random.PRNGKey(0)})
    agg2 = d.aggregate(updates, jnp.ones((4,)), {"key": jax.random.PRNGKey(1)})
    # Clipped mean has norm <= clip_norm (+ noise slack).
    assert float(jnp.linalg.norm(agg1)) < 1.5
    # Noise differs across keys.
    assert float(jnp.max(jnp.abs(agg1 - agg2))) > 0.0


def test_dp_privacy_accounting_monotone():
    d = get_defense("dp_sgd", {"noise_multiplier": 1.0})
    s1, s5 = d.privacy_spent(1), d.privacy_spent(5)
    # Correct RDP epsilon grows monotonically but sublinearly.
    assert 0 < s1["epsilon"] < s5["epsilon"] < 5 * s1["epsilon"]
    # The reference's naive formula composes linearly (artifact parity).
    assert s5["reference_epsilon"] == pytest.approx(
        5 * s1["reference_epsilon"])


def test_dp_account_round_steps_host_counter():
    d = get_defense("dp_sgd", {"noise_multiplier": 1.0})
    assert d.rounds_applied == 0
    d.account_round()
    d.account_round(2)
    assert d.rounds_applied == 3
    assert d.privacy_spent()["rounds"] == 3
    assert d.privacy_spent()["epsilon"] == pytest.approx(
        d.privacy_spent(3)["epsilon"])


# -------------------------------------------------------------- clipping ---
def test_gradient_clipping_bounds_rows(rng):
    updates = jnp.asarray(rng.normal(0, 10, size=(3, 32)).astype(np.float32))
    d = get_defense("gradient_clipping", {"clip_norm": 1.0})
    agg, aux = d.aggregate_with_aux(updates, jnp.ones((3,)))
    assert float(jnp.linalg.norm(agg)) <= 1.0 + 1e-5
    assert float(aux["num_clipped"]) == 3.0


# --------------------------------------------------------- norm bounding ---
def test_norm_bounding_rejects_out_of_range(rng):
    good = rng.normal(0, 0.1, size=(3, 16)).astype(np.float32)
    bad = 100 * np.ones((1, 16), np.float32)
    updates = jnp.asarray(np.concatenate([good, bad]))
    d = get_defense("norm_bounding", {"min_norm": 0.0, "max_norm": 10.0})
    agg, aux = d.aggregate_with_aux(updates, jnp.ones((4,)))
    assert float(aux["num_rejected"]) == 1.0
    assert float(jnp.max(jnp.abs(agg))) < 1.0
    # Detection flags exactly the rejected client.
    det = np.asarray(d.detect(updates, jnp.ones((4,))))
    np.testing.assert_array_equal(det, [0, 0, 0, 1])


def test_norm_bounding_all_rejected_falls_back(rng):
    updates = jnp.asarray(100 * np.ones((3, 8), np.float32))
    d = get_defense("norm_bounding", {"min_norm": 0.0, "max_norm": 1.0})
    agg, aux = d.aggregate_with_aux(updates, jnp.ones((3,)))
    # Fallback accepts everything (reference: differential_privacy.py:334-340).
    np.testing.assert_allclose(agg, 100 * np.ones((8,)), rtol=1e-6)


# ---------------------------------------------------------------- fltrust ---
def test_fltrust_trust_weights_follow_cosine(rng):
    server = jnp.asarray(np.ones((16,), np.float32))
    aligned = np.ones((1, 16), np.float32) * 2.0         # cos=1
    opposed = -np.ones((1, 16), np.float32)               # cos=-1 -> trust 0
    ortho = np.zeros((1, 16), np.float32); ortho[0, 0] = 1; ortho[0, 1] = -1
    updates = jnp.asarray(np.concatenate([aligned, opposed, ortho]))
    d = get_defense("fltrust", {})
    agg, aux = d.aggregate_with_aux(
        updates, jnp.ones((3,)), {"server_grad": server}
    )
    trust = np.asarray(aux["trust_scores"])
    assert trust[0] == pytest.approx(1.0, abs=1e-5)
    assert trust[1] == 0.0
    assert abs(trust[2]) < 1e-5
    # Aggregate = aligned update rescaled to server norm.
    np.testing.assert_allclose(np.asarray(agg), np.ones(16) * 1.0, rtol=1e-4)


def test_fltrust_zero_trust_falls_back_to_server_grad():
    server = jnp.asarray(np.ones((8,), np.float32))
    updates = jnp.asarray(-np.ones((2, 8), np.float32))
    d = get_defense("fltrust", {})
    agg, _ = d.aggregate_with_aux(updates, jnp.ones((2,)),
                                  {"server_grad": server})
    np.testing.assert_allclose(np.asarray(agg), np.ones(8), rtol=1e-6)


def test_fltrust_detect_flags_sign_flipper():
    """Trust is ReLU-clamped to >= 0, so the detector must use <= (a
    strict < with the default threshold 0.0 could never flag anyone)."""
    server = jnp.asarray(np.ones((16,), np.float32))
    honest = np.ones((2, 16), np.float32)
    flipped = -np.ones((1, 16), np.float32)  # cos = -1 -> trust 0
    updates = jnp.asarray(np.concatenate([honest, flipped]))
    d = get_defense("fltrust", {})
    det = np.asarray(d.detect(updates, jnp.ones((3,)),
                              {"server_grad": server}))
    assert det.tolist() == [0.0, 0.0, 1.0]


def test_dp_sgd_requires_fresh_key():
    """A fixed fallback key would re-add the identical noise every round
    (deterministic bias, not privacy) — missing key must fail loudly."""
    d = get_defense("dp_sgd", {"noise_multiplier": 0.1})
    with pytest.raises(ValueError, match="key"):
        d.aggregate(jnp.ones((3, 8)), jnp.ones((3,)))


def test_dp_accounting_tightens_for_heterogeneous_weights():
    """The weighted mean's worst-client sensitivity is clip*max_w/sum_w,
    not clip/n: installing heterogeneous client weights must INCREASE
    the reported epsilon versus the uniform assumption."""
    uniform = get_defense("dp_sgd", {"noise_multiplier": 1.0})
    hetero = get_defense("dp_sgd", {"noise_multiplier": 1.0})
    hetero.set_client_weights(np.array([100.0, 10.0, 10.0, 10.0]))
    uniform.account_round(5)
    hetero.account_round(5)
    assert (hetero.privacy_spent()["epsilon"]
            > uniform.privacy_spent()["epsilon"])
    # Uniform weights leave the accounting unchanged.
    same = get_defense("dp_sgd", {"noise_multiplier": 1.0})
    same.set_client_weights(np.ones(4))
    same.account_round(5)
    assert same.privacy_spent()["epsilon"] == pytest.approx(
        uniform.privacy_spent()["epsilon"])


def test_registry_names_match_reference():
    from multimodal_fl_security_tpu.defenses.base import DEFENSES

    for name in ("none", "fedavg", "krum", "multi_krum", "trimmed_mean",
                 "median", "geometric_median", "fltrust", "dp_sgd",
                 "gradient_clipping", "norm_bounding"):
        assert name in DEFENSES, name


def test_rdp_accountant_sane():
    from multimodal_fl_security_tpu.utils.privacy import RDPAccountant

    acc = RDPAccountant(noise_multiplier=1.0)
    acc.step(1)
    e1 = acc.epsilon(1e-5)
    acc.step(99)
    e100 = acc.epsilon(1e-5)
    # Composition grows sublinearly in epsilon (RDP), and more noise helps.
    assert 0 < e1 < e100 < 100 * e1
    tighter = RDPAccountant(noise_multiplier=4.0)
    tighter.step(100)
    assert tighter.epsilon(1e-5) < e100


def test_rdp_subsampling_amplification():
    import math

    from multimodal_fl_security_tpu.utils.privacy import (
        RDPAccountant,
        subsampled_gaussian_rdp,
    )

    # q = 1 reduces exactly to the full-participation Gaussian line.
    for a in (2, 4, 16, 64):
        assert subsampled_gaussian_rdp(1.0, 1.3, a) == a / (2 * 1.3 ** 2)
    # Cross-check the log-space evaluation against a direct small-number sum.
    q, z, a = 0.01, 1.0, 4
    direct = sum(
        math.comb(a, k) * (1 - q) ** (a - k) * q ** k
        * math.exp(k * (k - 1) / (2 * z * z))
        for k in range(a + 1)
    )
    expect = math.log(direct) / (a - 1)
    assert abs(subsampled_gaussian_rdp(q, z, a) - expect) < 1e-12
    # Amplification: epsilon strictly shrinks with the sampling rate.
    eps = {}
    for q in (0.05, 0.2, 1.0):
        acc = RDPAccountant(noise_multiplier=1.0, sampling_rate=q)
        acc.step(50)
        eps[q] = acc.epsilon(1e-5)
    assert 0 < eps[0.05] < eps[0.2] < eps[1.0]


def test_dp_sgd_set_sampling_rate_preserves_steps():
    from multimodal_fl_security_tpu.defenses import get_defense

    d = get_defense("dp_sgd", {"noise_multiplier": 1.0, "clip_norm": 1.0})
    d.account_round(10)
    full = d.privacy_spent()["epsilon"]
    d.set_sampling_rate(0.1)
    amplified = d.privacy_spent()["epsilon"]
    assert d.rounds_applied == 10 and d._accountant.steps == 10
    assert 0 < amplified < full
