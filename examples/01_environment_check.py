"""Environment check (the reference's notebook 01 as a script).

Verifies devices, dataset registry, model registry, and one jitted
forward/backward pass.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_fl_security_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from multimodal_fl_security_tpu.attacks.base import ATTACKS
from multimodal_fl_security_tpu.data.datasets import DATASETS, load_dataset
from multimodal_fl_security_tpu.defenses.base import DEFENSES
from multimodal_fl_security_tpu.models import MODELS, create_model, init_model
from multimodal_fl_security_tpu.models.registry import param_count


def main():
    print("devices:", jax.devices())
    print("datasets:", list(DATASETS.names()))
    print("models:", list(MODELS.names()))
    print("attacks:", list(ATTACKS.names()))
    print("defenses:", list(DEFENSES.names()))

    ds = load_dataset("synthetic", "train", num_train=64)
    model = create_model("simple_cnn", num_classes=10)
    batch = {k: jnp.asarray(v[:8]) for k, v in ds.arrays.items()}
    params = init_model(model, batch)["params"]
    print("simple_cnn params:", param_count({"params": params}))

    @jax.jit
    def loss_fn(p):
        logits = model.apply({"params": p}, batch, train=False)
        return jnp.mean(
            -jax.nn.log_softmax(logits)[jnp.arange(8), batch["label"][:8]]
        )

    loss, grads = jax.value_and_grad(loss_fn)(params)
    print("forward/backward ok: loss =", float(loss))


if __name__ == "__main__":
    main()
