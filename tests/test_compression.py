"""Uplink int8 compression with error feedback (runtime/compression.py)."""

import threading

import numpy as np

from multimodal_fl_security_tpu.runtime.compression import (
    Int8UplinkCompressor,
    decompress_reply,
    dequantize_delta,
    quantize_delta,
)
from multimodal_fl_security_tpu.runtime.transport import _encode


def test_quantize_round_trip_error_bound(rng):
    delta = rng.normal(0, 0.1, size=(10_000,)).astype(np.float32)
    q, scale = quantize_delta(delta)
    assert q.dtype == np.int8
    err = np.abs(dequantize_delta(q, scale) - delta)
    assert err.max() <= scale / 2 + 1e-9


def test_quantize_zero_vector():
    q, scale = quantize_delta(np.zeros(16, np.float32))
    assert scale == 0.0
    np.testing.assert_array_equal(dequantize_delta(q, scale), 0.0)


def test_error_feedback_compensates(rng):
    """Summing dequantized messages over many rounds of a constant true
    delta converges to the true sum (the residual carries the error)."""
    comp = Int8UplinkCompressor()
    g = np.zeros(512, np.float32)
    true_delta = rng.normal(0, 1e-3, size=(512,)).astype(np.float32)
    acc = np.zeros_like(true_delta)
    for _ in range(50):
        reply = comp.compress(g + true_delta, g)
        acc += dequantize_delta(np.asarray(reply["q_delta"]),
                                float(reply["q_scale"]))
    rel = np.linalg.norm(acc - 50 * true_delta) / np.linalg.norm(
        50 * true_delta)
    assert rel < 0.02


def test_decompress_reply_passthrough(rng):
    flat = rng.rand(64).astype(np.float32)
    out = decompress_reply({"params": flat}, np.zeros(64, np.float32))
    np.testing.assert_array_equal(out, flat)


def test_compressed_reply_is_4x_smaller(rng):
    g = np.zeros(100_000, np.float32)
    update = rng.normal(0, 0.01, size=(100_000,)).astype(np.float32)
    comp = Int8UplinkCompressor()
    small = _encode({**comp.compress(update, g), "num_examples": 10,
                     "metrics": {"loss": 1.0}})
    big = _encode({"params": update, "num_examples": 10,
                   "metrics": {"loss": 1.0}})
    assert len(small) < len(big) / 3.5


def test_compressed_fl_round_learns():
    """Threaded server + 2 int8-compressed clients: the dequantized path
    produces a finite, learning global model."""
    import socket as sk
    import time

    import jax.numpy as jnp

    from multimodal_fl_security_tpu.core.pytrees import (
        flatten_tree,
        unflatten_tree,
    )
    from multimodal_fl_security_tpu.data.datasets import load_dataset
    from multimodal_fl_security_tpu.models import create_model, init_model
    from multimodal_fl_security_tpu.runtime.client import FLClient
    from multimodal_fl_security_tpu.runtime.server import FLServer
    from multimodal_fl_security_tpu.utils.metrics import evaluate_model

    config = {
        "dataset": "synthetic",
        "dataset_params": {"num_train": 512, "num_test": 200},
        "num_clients": 2, "batch_size": 16, "local_epochs": 2,
        "learning_rate": 0.05, "partition": "iid", "compression": "int8",
    }
    ds = load_dataset("synthetic", "train", **config["dataset_params"])
    test = load_dataset("synthetic", "test", **config["dataset_params"])
    model = create_model("simple_cnn", num_classes=10)
    template = init_model(model, {k: v[:16] for k, v in ds.arrays.items()},
                          seed=0)["params"]
    flat0 = np.asarray(flatten_tree(template), np.float32)

    s = sk.socket(); s.bind(("127.0.0.1", 0)); port = s.getsockname()[1]
    s.close()
    server = FLServer(flat0, num_clients=2, num_rounds=3,
                      host="127.0.0.1", port=port)
    result = {}
    st = threading.Thread(target=lambda: result.update(f=server.serve()))
    st.start()
    time.sleep(0.3)
    clients = [FLClient(i, config) for i in range(2)]
    for c in clients:
        assert c._compressor is not None
        c.fit(flat0, 0)  # warm compiles sequentially
    threads = [threading.Thread(target=c.run, kwargs={"port": port})
               for c in clients]
    for t in threads:
        t.start()
    st.join(timeout=240)
    for t in threads:
        t.join(timeout=60)
    assert "f" in result
    final = unflatten_tree(template, jnp.asarray(result["f"]))
    stats = evaluate_model(model, final, test)
    assert np.isfinite(stats["loss"])
    assert stats["accuracy"] > 0.3  # learns through the quantized uplink


# ------------------------------------------------------------------ top-k ---
def test_topk_keeps_largest_and_residual_flushes(rng):
    from multimodal_fl_security_tpu.runtime.compression import (
        TopKUplinkCompressor,
    )

    d = 10_000
    g = np.zeros(d, np.float32)
    delta = rng.normal(0, 0.01, size=(d,)).astype(np.float32)
    delta[:5] = [5.0, -4.0, 3.0, -2.0, 1.0]  # dominant coordinates
    c = TopKUplinkCompressor(ratio=0.0005)  # k = 5
    reply = c.compress(g + delta, g)
    assert set(np.asarray(reply["sp_idx"]).tolist()) == {0, 1, 2, 3, 4}
    rec = decompress_reply(reply, g)
    np.testing.assert_allclose(rec[:5], delta[:5], rtol=1e-6)

    # Error feedback: the dropped mass lives in the residual and flushes
    # over later rounds (k=500/round drains all 10k coords in 20 rounds).
    c2 = TopKUplinkCompressor(ratio=0.05)
    total_flushed = np.zeros_like(delta)
    total_flushed += decompress_reply(c2.compress(g + delta, g), g) - g
    for _ in range(20):
        total_flushed += decompress_reply(c2.compress(g, g), g) - g
    np.testing.assert_allclose(total_flushed, delta, atol=1e-6)


def test_topk8_quantized_values(rng):
    from multimodal_fl_security_tpu.runtime.compression import (
        make_compressor,
    )

    d = 4096
    g = np.zeros(d, np.float32)
    update = rng.normal(0, 0.1, size=(d,)).astype(np.float32)
    c = make_compressor("topk8", {"topk_ratio": 0.05})
    reply = c.compress(update, g)
    assert "sp_qval" in reply and reply["sp_qval"].dtype == np.int8
    rec = decompress_reply(reply, g)
    kept = np.asarray(reply["sp_idx"], np.int64)
    scale = float(reply["sp_scale"])
    assert np.abs(rec[kept] - update[kept]).max() <= scale / 2 + 1e-9


def test_topk_wire_size(rng):
    from multimodal_fl_security_tpu.runtime.compression import (
        make_compressor,
    )

    d = 100_000
    g = np.zeros(d, np.float32)
    update = rng.normal(0, 0.1, size=(d,)).astype(np.float32)
    dense = len(_encode({"params": update}))
    c = make_compressor("topk", {"topk_ratio": 0.01})
    sparse = len(_encode(c.compress(update, g)))
    assert sparse < dense * 0.03, (sparse, dense)
    c8 = make_compressor("topk8", {"topk_ratio": 0.01})
    sparse8 = len(_encode(c8.compress(update, g)))
    assert sparse8 < dense * 0.015, (sparse8, dense)


def test_make_compressor_factory():
    import pytest

    from multimodal_fl_security_tpu.runtime.compression import (
        Int8UplinkCompressor,
        TopKUplinkCompressor,
        make_compressor,
    )

    assert make_compressor(None) is None
    assert make_compressor("") is None
    assert isinstance(make_compressor("int8"), Int8UplinkCompressor)
    assert isinstance(make_compressor("topk"), TopKUplinkCompressor)
    assert make_compressor("topk8").quantize
    with pytest.raises(ValueError):
        make_compressor("gzip")
