"""Virtual-clock FedBuff simulation (rounds/async_sim.py): the
deterministic analog of the TCP async server, property-tested at scales
the wall-clock path cannot reach. The aggregation arithmetic is the
SHARED runtime/fedbuff.py code, so these tests pin the live server's
staleness math too."""

import jax
import numpy as np
import pytest

from multimodal_fl_security_tpu.data.datasets import Dataset
from multimodal_fl_security_tpu.data.stacking import stack_clients
from multimodal_fl_security_tpu.models import create_model
from multimodal_fl_security_tpu.rounds.async_sim import simulate_fedbuff
from multimodal_fl_security_tpu.rounds.engine import TrainSpec


def _client_data(c, n=16, num_classes=5, seed=0):
    rng = np.random.default_rng(seed)
    protos = rng.normal(0, 1, (num_classes, 8 * 8)).astype(np.float32)
    labels = rng.integers(0, num_classes, c * n).astype(np.int32)
    images = (protos[labels] + 0.3 * rng.normal(0, 1, (c * n, 64))
              ).astype(np.float32).reshape(-1, 8, 8, 1)
    ds = Dataset({"image": images, "label": labels}, num_classes)
    idx = [np.arange(i * n, (i + 1) * n) for i in range(c)]
    return stack_clients(ds, idx, pad_multiple=8, layout="flat")


def _model(num_classes=5):
    return create_model("simple_cnn", num_classes=num_classes)


SPEC = TrainSpec(learning_rate=0.05, local_epochs=1, batch_size=8)


def test_determinism():
    cd = _client_data(6)
    model = _model()
    kw = dict(durations=np.linspace(1, 3, 6), num_aggregations=4,
              buffer_size=3, seed=7)
    r1 = simulate_fedbuff(model, cd, SPEC, **kw)
    r2 = simulate_fedbuff(model, cd, SPEC, **kw)
    for a, b in zip(jax.tree_util.tree_leaves(r1.final_params),
                    jax.tree_util.tree_leaves(r2.final_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert r1.history == r2.history


def test_slow_client_is_stale_and_discounted():
    """One client 20x slower than the rest: when its update finally
    lands, versions have advanced -> positive staleness and a weight
    discounted by exactly (1 + s)^-0.5."""
    c = 4
    cd = _client_data(c)
    # Slow enough to be stale, fast enough to land within the horizon
    # (flushes happen ~1/time-unit; the slow client arrives at t=5).
    durations = np.array([1.0, 1.0, 1.0, 5.0])
    res = simulate_fedbuff(_model(), cd, SPEC, durations=durations,
                           num_aggregations=10, buffer_size=3,
                           staleness_exponent=0.5)
    n = np.asarray(cd.counts, np.float32)
    slow_seen = False
    for h in res.history:
        for cid, s, w in zip(h["clients"], h["staleness"], h["weights"]):
            np.testing.assert_allclose(
                w, n[cid] * (1.0 + s) ** -0.5, rtol=1e-6
            )
            if cid == 3 and s > 0:
                slow_seen = True
                assert w < n[3]  # discounted below its example count
    assert slow_seen, "slow client never contributed a stale update"


def test_fast_clients_dominate_contributions():
    c = 4
    cd = _client_data(c)
    durations = np.array([1.0, 1.0, 1.0, 20.0])
    res = simulate_fedbuff(_model(), cd, SPEC, durations=durations,
                           num_aggregations=8, buffer_size=3)
    contribs = np.zeros(c)
    for h in res.history:
        for cid in h["clients"]:
            contribs[cid] += 1
    assert contribs[:3].min() > contribs[3]


def test_buffer_flush_sizes_and_versions_at_scale():
    """C=100 in seconds: every flush consumes exactly buffer_size
    updates, versions increment by one, and staleness never exceeds the
    number of flushes that happened since dispatch."""
    c = 100
    cd = _client_data(c, n=8)
    res = simulate_fedbuff(
        _model(), cd, TrainSpec(learning_rate=0.05, local_epochs=1,
                                batch_size=8),
        durations=np.linspace(1.0, 5.0, c),
        num_aggregations=10, buffer_size=10,
    )
    assert len(res.history) == 10
    for k, h in enumerate(res.history):
        assert h["version"] == k + 1
        assert len(h["clients"]) == 10
        assert max(h["staleness"]) <= k
    assert res.num_updates == 100  # 10 flushes x buffer 10


def test_equal_speeds_buffer_c_is_synchronous():
    """buffer_size = C with equal durations: every flush contains all C
    clients exactly once, and the FIRST flush is fully synchronous
    (staleness 0, weights = raw example counts). Later flushes carry
    staleness <= 1: clients are re-dispatched the moment their update is
    consumed — BEFORE the flush their update triggers — exactly like the
    live server's task hand-out, so all but the flush-triggering client
    trained against the pre-flush global."""
    c = 8
    cd = _client_data(c)
    res = simulate_fedbuff(_model(), cd, SPEC,
                           durations=np.ones(c),
                           num_aggregations=3, buffer_size=c)
    n = np.asarray(cd.counts, np.float32)
    for k, h in enumerate(res.history):
        assert sorted(h["clients"]) == list(range(c))
        if k == 0:
            assert h["staleness"] == [0.0] * c
            np.testing.assert_allclose(h["weights"], n[h["clients"]])
        else:
            assert max(h["staleness"]) <= 1.0


def test_simulation_learns():
    cd = _client_data(8, n=32)
    model = _model()
    res = simulate_fedbuff(model, cd, SPEC, durations=np.ones(8),
                           num_aggregations=12, buffer_size=4)
    # Evaluate on the training pool (prototype task): well above chance.
    from multimodal_fl_security_tpu.data.stacking import make_batch_adapter

    adapt = make_batch_adapter(cd.feature_shapes)
    batch = {k: v.reshape((-1,) + v.shape[2:])[:256]
             for k, v in cd.arrays.items()}
    if adapt is not None:
        batch = adapt(batch)
    logits = model.apply({"params": res.final_params}, batch, train=False)
    acc = float((np.argmax(np.asarray(logits), -1)
                 == np.asarray(batch["label"])).mean())
    assert acc > 0.5, acc


def test_robust_defense_composes():
    from multimodal_fl_security_tpu.defenses import get_defense

    cd = _client_data(6)
    res = simulate_fedbuff(_model(), cd, SPEC, durations=np.ones(6),
                           num_aggregations=3, buffer_size=6,
                           defense=get_defense("median", {}))
    assert len(res.history) == 3
    flat = np.concatenate([np.asarray(x).ravel() for x in
                           jax.tree_util.tree_leaves(res.final_params)])
    assert np.all(np.isfinite(flat))


def test_fedbuff_randomized_defense_gets_fresh_key_per_flush():
    """dp_sgd under FedBuff must draw DIFFERENT noise each buffer flush
    (a constant fallback key re-added the identical noise vector,
    voiding the DP guarantee) while staying deterministic per flush."""
    from multimodal_fl_security_tpu.defenses import get_defense
    from multimodal_fl_security_tpu.runtime.fedbuff import fedbuff_aggregate

    d = get_defense("dp_sgd", {"clip_norm": 1.0, "noise_multiplier": 1.0})
    rng = np.random.default_rng(3)
    params = np.zeros(64, np.float32)
    deltas = rng.normal(0, 0.1, (4, 64)).astype(np.float32)
    w = np.ones(4, np.float32)
    a1 = fedbuff_aggregate(params, deltas, w, d, 1.0, flush_idx=1)
    a2 = fedbuff_aggregate(params, deltas, w, d, 1.0, flush_idx=2)
    a1b = fedbuff_aggregate(params, deltas, w, d, 1.0, flush_idx=1)
    assert not np.allclose(a1, a2)          # fresh noise per flush
    np.testing.assert_array_equal(a1, a1b)  # deterministic per flush
