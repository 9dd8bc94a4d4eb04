"""Probe: can Mosaic lower jax.value_and_grad INSIDE a Pallas kernel body?

The fused local-training megakernel (ops/fused_train.py) needs, per SGD
step, gradients of the packed-layout SimpleCNN loss w.r.t. VMEM-resident
weights. Hand-transposing every layout op is the fallback; if AD traced
inside the kernel body lowers, the kernel can express the whole step as
value_and_grad of the mirror loss and correctness reduces to the
already-tested mirror. This probes that question op-family by op-family
on the real toolchain, same style as benchmarks/mosaic_probe.py:

  1. roll wrapped in custom_vjp (pltpu.roll has no AD rule),
  2. iota-masked select, relu, max-of-two (select-routed grads),
  3. batched dot over a major axis ([r,B,K]x[r,K,F]) — AD generates the
     transposed batched forms for dx/dw,
  4. 2D wgrad contraction over merged-major rows,
  5. masked softmax CE,
  6. the full mini-chain: value_and_grad of a 2-layer packed block with
     all of the above, vs the same AD outside the kernel.

Run: python benchmarks/ad_in_kernel_probe.py   (needs the TPU).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import json
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RESULTS = []


def probe(name):
    def deco(fn):
        @functools.wraps(fn)
        def run():
            try:
                fn()
                RESULTS.append((name, "PASS", ""))
                print(f"PASS {name}")
            except Exception as e:  # noqa: BLE001 - record and continue
                msg = "".join(traceback.format_exception_only(type(e), e))
                RESULTS.append((name, "FAIL", msg.strip()))
                print(f"FAIL {name}: {msg.splitlines()[0][:200]}")
        run._probe = True
        return run
    return deco


def _call(kernel, out_shape, *args, **kw):
    return pl.pallas_call(kernel, out_shape=out_shape, **kw)(*args)


# Differentiable roll: forward = pltpu.roll when lowering inside Pallas
# (jnp.roll decomposes into slice+concat there), backward = opposite roll.
# shift/axis must be static (nondiff) for custom_vjp.
@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def droll(x, shift, axis):
    return pltpu.roll(x, shift, axis)


def _droll_fwd(x, shift, axis):
    return droll(x, shift, axis), None


def _droll_bwd(shift, axis, res, g):
    return (droll(g, (-shift) % g.shape[axis], axis),)


droll.defvjp(_droll_fwd, _droll_bwd)


@probe("ad_roll: grad through custom_vjp roll in-kernel")
def p_ad_roll():
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 60, 128))

    def loss(x):
        y = droll(x, 96, 2) * 0.5 + droll(x, 4, 1)
        return jnp.sum(y * y)

    def k(x_ref, g_ref):
        g_ref[:] = jax.grad(loss)(x_ref[:])

    g = jax.jit(lambda x: _call(
        k, jax.ShapeDtypeStruct(x.shape, x.dtype), x))(x)
    g_ref = jax.grad(
        lambda x: jnp.sum(jnp.square(jnp.roll(x, -32, 2) * 0.5
                                     + jnp.roll(x, 4, 1))))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4,
                               atol=1e-5)


@probe("ad_mask_relu_max: grads through select/relu/max in-kernel")
def p_ad_mask():
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 60, 128))

    def loss(x):
        rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        m = (rows % 4 < 3).astype(jnp.float32)
        a = jax.nn.relu(x) * m
        b = jnp.maximum(a, droll(a, 64, 2))
        return jnp.sum(b)

    def k(x_ref, g_ref):
        g_ref[:] = jax.grad(loss)(x_ref[:])

    g = jax.jit(lambda x: _call(
        k, jax.ShapeDtypeStruct(x.shape, x.dtype), x))(x)

    def loss_ref(x):
        rows = np.arange(60)[None, :, None]
        m = (rows % 4 < 3).astype(np.float32)
        a = jax.nn.relu(x) * jnp.asarray(m)
        b = jnp.maximum(a, jnp.roll(a, -64, 2))
        return jnp.sum(b)

    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4,
                               atol=1e-5)


@probe("ad_batched_dot: grads of [28,32,128]x[28,128,128] in-kernel")
def p_ad_bdot():
    x = jax.random.normal(jax.random.PRNGKey(2), (28, 32, 128)) * 0.1
    w = jax.random.normal(jax.random.PRNGKey(3), (28, 128, 128)) * 0.1

    def loss(x, w):
        part = jax.lax.dot_general(
            x, w, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return jnp.sum(jax.nn.relu(part.sum(0)))

    def k(x_ref, w_ref, gx_ref, gw_ref):
        gx, gw = jax.grad(loss, argnums=(0, 1))(x_ref[:], w_ref[:])
        gx_ref[:] = gx
        gw_ref[:] = gw

    gx, gw = jax.jit(lambda x, w: _call(
        k, (jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(w.shape, w.dtype)), x, w))(x, w)
    gx_ref, gw_ref = jax.grad(loss, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), rtol=1e-3,
                               atol=1e-4)


@probe("ad_wgrad2d: grads of merged-rows [1920,128]x[1920,256] in-kernel")
def p_ad_wgrad():
    a = jax.random.normal(jax.random.PRNGKey(4), (32, 60, 128)) * 0.1
    d = jax.random.normal(jax.random.PRNGKey(5), (32, 60, 256)) * 0.1

    def loss(a, d):
        am = a.reshape(1920, 128)
        dm = d.reshape(1920, 256)
        w = jax.lax.dot_general(am, dm, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return jnp.sum(w * w)

    def k(a_ref, d_ref, g_ref):
        g_ref[:] = jax.grad(loss)(a_ref[:], d_ref[:])

    g = jax.jit(lambda a, d: _call(
        k, jax.ShapeDtypeStruct(a.shape, a.dtype), a, d))(a, d)
    g_ref = jax.grad(loss)(a, d)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-3,
                               atol=1e-4)


@probe("ad_softmax_ce: grads of masked CE in-kernel")
def p_ad_ce():
    logits = jax.random.normal(jax.random.PRNGKey(6), (32, 128))
    onehot = jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(7), (32,), 0, 10), 128)

    def loss(z, oh):
        lanes = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
        zm = jnp.where(lanes < 10, z, -1e30)
        logp = zm - jax.scipy.special.logsumexp(zm, axis=1, keepdims=True)
        return -jnp.sum(oh * logp) / 32.0

    def k(z_ref, oh_ref, g_ref):
        g_ref[:] = jax.grad(loss)(z_ref[:], oh_ref[:])

    g = jax.jit(lambda z, oh: _call(
        k, jax.ShapeDtypeStruct(logits.shape, jnp.float32),
        z, oh))(logits, onehot)
    g_ref = jax.grad(loss)(logits, onehot)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4,
                               atol=1e-6)


@probe("ad_full_chain: value_and_grad of 2-layer packed block in-kernel")
def p_ad_chain():
    key = jax.random.PRNGKey(8)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jax.random.normal(k1, (32, 60, 128)) * 0.5
    w1 = jax.random.normal(k2, (9, 128, 256)) * 0.05
    w2 = jax.random.normal(k3, (28, 128, 128)) * 0.05
    onehot = jax.nn.one_hot(jax.random.randint(k4, (32,), 0, 10), 128)

    def loss(w1, w2, x, oh):
        # conv-ish: 3 shifted taps, accumulated batched GEMMs, mask, relu
        z = jnp.zeros((32, 60, 256), jnp.float32)
        for t, sh in enumerate((0, 32, 64)):
            a = droll(x, sh, 2) if sh else x
            z = z + jax.lax.dot_general(
                a, w1[3 * t], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        rows = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
        h = jax.nn.relu(z) * (rows % 4 < 3).astype(jnp.float32)
        # pool-ish: sublane compaction + lane max
        p = h[:, :56, :].reshape(32, 7, 2, 4, 256).max(2)
        p = p.reshape(32, 28, 256)
        p = jnp.maximum(p, droll(p, 128, 2))[:, :, :128]
        # fc over row slots
        t3 = jnp.swapaxes(p, 0, 1)                       # [28, 32, 128]
        part = jax.lax.dot_general(
            t3, w2, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        z2 = jax.nn.relu(part.sum(0))                    # [32, 128]
        lanes = jax.lax.broadcasted_iota(jnp.int32, z2.shape, 1)
        zm = jnp.where(lanes < 10, z2, -1e30)
        logp = zm - jax.scipy.special.logsumexp(zm, 1, keepdims=True)
        return -jnp.sum(oh * logp) / 32.0

    def k(x_ref, w1_ref, w2_ref, oh_ref, g1_ref, g2_ref):
        g1, g2 = jax.grad(loss, argnums=(0, 1))(
            w1_ref[:], w2_ref[:], x_ref[:], oh_ref[:])
        g1_ref[:] = g1
        g2_ref[:] = g2

    g1, g2 = jax.jit(lambda x, w1, w2, oh: _call(
        k, (jax.ShapeDtypeStruct(w1.shape, w1.dtype),
            jax.ShapeDtypeStruct(w2.shape, w2.dtype)),
        x, w1, w2, oh))(x, w1, w2, onehot)

    def loss_ref(w1, w2, x):
        z = jnp.zeros((32, 60, 256), jnp.float32)
        for t, sh in enumerate((0, 32, 64)):
            a = jnp.roll(x, -sh, 2) if sh else x
            z = z + jnp.einsum("brk,kf->brf", a, w1[3 * t])
        rows = jnp.arange(60)[None, :, None]
        h = jax.nn.relu(z) * (rows % 4 < 3).astype(jnp.float32)
        p = h[:, :56, :].reshape(32, 7, 2, 4, 256).max(2).reshape(32, 28, 256)
        p = jnp.maximum(p, jnp.roll(p, -128, 2))[:, :, :128]
        part = jnp.einsum("rbk,rkf->rbf", jnp.swapaxes(p, 0, 1), w2)
        z2 = jax.nn.relu(part.sum(0))
        lanes = jnp.arange(128)[None, :]
        zm = jnp.where(lanes < 10, z2, -1e30)
        logp = zm - jax.scipy.special.logsumexp(zm, 1, keepdims=True)
        return -jnp.sum(onehot * logp) / 32.0

    g1_ref, g2_ref = jax.grad(
        loss_ref, argnums=(0, 1))(w1, w2, x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g1_ref),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g2_ref),
                               rtol=1e-3, atol=1e-4)


def main():
    for fn in sorted(globals().values(), key=lambda f: getattr(f, "__name__", "")):
        if callable(fn) and getattr(fn, "_probe", False):
            fn()
    passed = sum(1 for _, s, _ in RESULTS if s == "PASS")
    out = {
        "purpose": "AD-inside-Pallas-kernel feasibility for the fused "
                   "local-training megakernel (ops/fused_train.py)",
        "platform": f"{jax.devices()[0].device_kind} via "
                    f"{jax.default_backend()}, jax {jax.__version__}",
        "passed": passed,
        "total": len(RESULTS),
        "results": [
            {"probe": n, "status": s, **({"detail": d[:200]} if d else {})}
            for n, s, d in RESULTS
        ],
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "bench",
        "ad_in_kernel_probes.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"passed": passed, "total": len(RESULTS)}))


if __name__ == "__main__":
    main()
