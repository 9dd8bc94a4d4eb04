"""Simulation runner: the TPU equivalent of the reference's workhorse
``ExperimentRunner.run_simulation`` (reference: experiments/run_experiments.py:98-314).

Call-stack parity (SURVEY.md §3.1): seed -> load data + model -> attack +
defense factories -> per-client partition + poisoning -> round loop ->
evaluate per round -> triggered-testset ASR -> JSON results. The difference
is that each round is one jitted program over the stacked client axis
instead of a sequential Python loop.

Deliberate fixes vs the reference (SURVEY.md §2.9): alpha is plumbed,
model-poisoning attacks actually fire in simulation, FLTrust works (the
engine computes its root-trained server delta), and the partition seed is a
real config field.
"""

from __future__ import annotations

import datetime
import logging
import os
import time
from typing import Dict, List, Optional

import jax
import numpy as np

from multimodal_fl_security_tpu.attacks import get_attack
from multimodal_fl_security_tpu.attacks.backdoor import DistributedBackdoorAttack
from multimodal_fl_security_tpu.data.datasets import Dataset, load_dataset
from multimodal_fl_security_tpu.data.partition import partition_data
from multimodal_fl_security_tpu.data.stacking import stack_clients
from multimodal_fl_security_tpu.defenses import get_defense
from multimodal_fl_security_tpu.experiments.config import (
    ExperimentConfig,
    ExperimentResults,
)
from multimodal_fl_security_tpu.models import create_model, init_model
from multimodal_fl_security_tpu.rounds.engine import RoundEngine, TrainSpec
from multimodal_fl_security_tpu.utils import metrics as M

logger = logging.getLogger(__name__)


class ExperimentRunner:
    def __init__(self, results_dir: str = "results"):
        self.results_dir = results_dir

    # ------------------------------------------------------------------
    def run_simulation(self, config: ExperimentConfig,
                       save: bool = False) -> ExperimentResults:
        t0 = time.time()
        rng = jax.random.PRNGKey(config.seed)
        init_key, round_key = jax.random.split(rng)

        if config.resident_layout == "s2d":
            # Space-to-depth residents feed the SimpleCNN stem's blocked
            # input path (ops/s2d.py); other models have no s2d stem, and
            # image-space augmentation cannot run on blocks.
            if config.default_model() not in ("simple_cnn", "mnist_cnn"):
                raise ValueError(
                    "resident_layout='s2d' requires a simple_cnn-family "
                    f"model; dataset {config.dataset!r} maps to "
                    f"{config.default_model()!r}"
                )
            if config.augment != "none":
                raise ValueError(
                    "resident_layout='s2d' is incompatible with image-space "
                    "augmentation (augment=" + config.augment + ")"
                )

        # L1: data ------------------------------------------------------
        ds_kwargs = dict(config.dataset_params)
        train = load_dataset(config.dataset, "train", config.data_dir, **ds_kwargs)
        test = load_dataset(config.dataset, "test", config.data_dir, **ds_kwargs)

        # L3: attack + defense -------------------------------------------
        attack_cfg = config.attack_config()
        if "image" in train.arrays:
            # Trigger placement needs the true image geometry; the reference
            # defaulted to 28x28 and relied on MNIST (backdoor.py:163).
            attack_cfg.setdefault("image_size", train.arrays["image"].shape[1:3])
        attack = (
            get_attack(config.attack_type, attack_cfg)
            if config.attack_enabled
            else get_attack("none")
        )
        defense = (
            get_defense(config.defense_type, config.defense_config())
            if config.defense_enabled
            else get_defense("none")
        )

        # L1: partition + per-client data poisoning ----------------------
        client_indices = partition_data(
            train.labels,
            config.num_clients,
            config.partition,
            alpha=config.alpha,
            seed=config.partition_seed,
        )
        malicious = sorted(config.malicious_clients)
        shards: List[Dataset] = []
        for i, idx in enumerate(client_indices):
            shard = train.subset(idx)
            if i in malicious and attack.is_data_poisoning():
                if isinstance(attack, DistributedBackdoorAttack):
                    part = attack.for_part(malicious.index(i) % attack.num_parts)
                    shard = part.poison_dataset(shard)
                else:
                    shard = attack.poison_dataset(shard)
            shards.append(shard)

        # Re-assemble into one dataset-per-client stacking (flat 128-aligned
        # resident layout by default; see ExperimentConfig.resident_layout).
        client_data = _stack_shards(
            shards, train.num_classes, config.batch_size,
            layout=config.resident_layout,
            resident_dtype=config.resident_dtype,
        )

        # L2: model -------------------------------------------------------
        import jax.numpy as jnp

        from multimodal_fl_security_tpu.data.stacking import make_batch_adapter

        model = create_model(
            config.default_model(), num_classes=train.num_classes,
            dtype=jnp.dtype(config.compute_dtype).type,
            **config.model_params,
        )
        sample_batch = {
            k: v[0, : config.batch_size] for k, v in client_data.arrays.items()
        }
        adapt = make_batch_adapter(client_data.feature_shapes)
        if adapt is not None:
            sample_batch = adapt(sample_batch)
        variables = init_model(model, sample_batch, rng=init_key)
        params = variables["params"]

        # Transfer learning: merge a local pretrained checkpoint and
        # optionally freeze the backbone (reference: cub200_cnn.py:29-54).
        frozen_prefixes: tuple = ()
        if config.pretrained_path:
            from multimodal_fl_security_tpu.models.pretrained import (
                load_pretrained,
            )

            params, load_info = load_pretrained(params, config.pretrained_path)
            logger.info(
                "%s: pretrained %s -> %d leaves loaded, %d reinitialized "
                "(head), %d missing", config.name, config.pretrained_path,
                len(load_info["loaded"]), len(load_info["reinitialized"]),
                len(load_info["missing"]),
            )
        if config.freeze_backbone:
            from multimodal_fl_security_tpu.models.pretrained import (
                backbone_prefixes,
            )

            frozen_prefixes = backbone_prefixes(params)

        # FLTrust root dataset (reference: fltrust.py:67-83 subsamples 100).
        root_data = None
        if getattr(defense, "needs_server_grad", False):
            root_size = int(getattr(defense, "root_dataset_size", 100))
            root_rng = np.random.RandomState(config.seed)
            root_idx = root_rng.choice(
                len(train), size=min(root_size, len(train)), replace=False
            )
            root_data = {k: v[root_idx] for k, v in train.arrays.items()}

        mesh = None
        if config.use_mesh:
            from multimodal_fl_security_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(config.mesh_devices)
            if config.num_clients % mesh.devices.size != 0:
                raise ValueError(
                    f"num_clients={config.num_clients} must divide evenly over "
                    f"{mesh.devices.size} mesh devices"
                )

        spec = TrainSpec(
            learning_rate=config.learning_rate,
            momentum=config.momentum,
            weight_decay=config.weight_decay,
            clip_norm=config.clip_norm,
            local_epochs=config.local_epochs,
            batch_size=config.batch_size,
            augment=config.augment,
            fedprox_mu=config.fedprox_mu,
            frozen_prefixes=frozen_prefixes,
            label_smoothing=config.label_smoothing,
            lr_schedule=config.lr_schedule,
            warmup_rounds=config.warmup_rounds,
            schedule_rounds=config.num_rounds,
            min_lr_frac=config.min_lr_frac,
        )
        from multimodal_fl_security_tpu.rounds.server_opt import (
            make_server_optimizer,
        )

        engine = RoundEngine(
            model,
            client_data,
            spec,
            attack=attack,
            defense=defense,
            malicious_clients=malicious,
            root_data=root_data,
            mesh=mesh,
            clients_per_round=config.clients_per_round,
            server_opt=make_server_optimizer(
                config.server_optimizer, config.server_opt_params
            ),
            client_chunk=config.client_chunk,
        )

        # Evaluation programs (built once; jit caches inside).
        eval_batches = M.reshape_eval_batches(test, config.eval_batch_size)
        eval_fn = M.make_eval_fn(model, config.eval_batch_size)

        # Triggered-testset batches for ASR (built once when applicable).
        triggered = (
            attack.create_poisoned_testset(test) if config.attack_enabled
            else None
        )
        trig_batches = (
            M.reshape_eval_batches(triggered, config.eval_batch_size)
            if triggered is not None else None
        )

        trig_mask = (
            np.asarray(trig_batches["mask"]).reshape(-1) > 0
            if trig_batches is not None else None
        )

        def asr_now(p) -> Optional[float]:
            if trig_batches is None:
                return None
            _, preds = eval_fn(p, trig_batches)
            hits = np.asarray(preds).reshape(-1)[trig_mask] == int(
                getattr(attack, "target_class", 0)
            )
            return float(hits.mean()) if trig_mask.any() else 0.0

        tracker = None
        if config.track:
            from multimodal_fl_security_tpu.utils.tracking import (
                ExperimentTracker,
            )

            tracker = ExperimentTracker(config.name, log_dir=config.track_dir,
                                        config=config.to_dict())

        # ROUND LOOP ------------------------------------------------------
        round_accuracies: List[float] = []
        round_losses: List[float] = []
        start_round = 0
        if config.checkpoint_dir and config.resume_from_checkpoint:
            from multimodal_fl_security_tpu.utils.checkpoint import (
                restore_checkpoint,
            )

            restored = restore_checkpoint(
                os.path.join(config.checkpoint_dir, config.name), params
            )
            if restored is not None:
                start_round, params, _, extra = restored
                round_accuracies = list(extra.get("round_accuracies", []))
                round_losses = list(extra.get("round_losses", []))
                logger.info("%s resumed from round %d", config.name,
                            start_round)
        # Privacy accounting (SURVEY.md §2.9-6: the reference's accountant is
        # never consulted by its loop; here the loop steps it every round).
        accounts_privacy = hasattr(defense, "account_round")
        if hasattr(defense, "set_client_weights"):
            # Tighten epsilon to the actual weighted-mean sensitivity
            # (heterogeneous shards make the heaviest client's effective
            # noise multiplier smaller than the nominal z).
            defense.set_client_weights(engine.counts)
        if engine.clients_per_round and hasattr(defense, "set_sampling_rate"):
            # Client subsampling amplifies privacy: account at the Poisson
            # bound with q = k/C (utils/privacy.py).
            defense.set_sampling_rate(
                engine.clients_per_round / engine.num_clients
            )
        for r in range(start_round, config.num_rounds):
            rkey = jax.random.fold_in(round_key, r)
            params, round_metrics = engine.run_round(params, rkey,
                                                     round_idx=r)
            totals, _ = eval_fn(params, eval_batches)
            # ONE batched device->host transfer for every per-round scalar
            # (device_get issues all copies async, then gathers): each
            # separate float()/np.asarray() is a full host<->device round
            # trip, and those fetch latencies — not eval compute — were the
            # product-path round tail vs the bare engine (runner_bench).
            small = {
                k: v for k, v in round_metrics.items()
                if (v.size if hasattr(v, "size") else np.asarray(v).size) == 1
            }
            totals, defense_metrics = jax.device_get((totals, small))
            count = max(float(totals["count"]), 1.0)
            acc = float(totals["correct"]) / count
            loss = float(totals["loss_sum"]) / count
            round_accuracies.append(acc)
            round_losses.append(loss)
            round_asr = asr_now(params) if config.eval_asr_every_round else None
            if accounts_privacy:
                defense.account_round()
                defense_metrics["privacy_epsilon"] = (
                    defense.privacy_spent()["epsilon"]
                )
            if tracker is not None:
                tracker.log_round(
                    r + 1, accuracy=acc, loss=loss, asr=round_asr,
                    defense_metrics=defense_metrics,
                )
            logger.info(
                "%s round %d/%d acc=%.4f loss=%.4f%s",
                config.name, r + 1, config.num_rounds, acc, loss,
                f" asr={round_asr:.4f}" if round_asr is not None else "",
            )
            if (
                config.checkpoint_dir
                and config.checkpoint_every
                and (r + 1) % config.checkpoint_every == 0
            ):
                from multimodal_fl_security_tpu.utils.checkpoint import (
                    save_checkpoint,
                )

                save_checkpoint(
                    os.path.join(config.checkpoint_dir, config.name),
                    r + 1, params, rkey,
                    extra={"round_accuracies": round_accuracies,
                           "round_losses": round_losses},
                )

        # ASR -------------------------------------------------------------
        asr: Optional[float] = None
        if config.attack_enabled:
            if trig_batches is not None:
                asr = asr_now(params)
            elif attack.name == "label_flip":
                asr = M.compute_label_flip_asr(
                    model, params, test,
                    source_class=int(getattr(attack, "source_class", 7)),
                    target_class=int(getattr(attack, "target_class", 1)),
                    batch_size=config.eval_batch_size,
                )
        if tracker is not None:
            tracker.finish({"final_accuracy": round_accuracies[-1]
                            if round_accuracies else 0.0,
                            "attack_success_rate": asr})

        extra_metrics: Dict = {}
        if accounts_privacy:
            extra_metrics["privacy"] = defense.privacy_spent()

        if config.personalized_eval:
            import dataclasses as _dc

            from multimodal_fl_security_tpu.rounds.personalization import (
                personalized_evaluation,
            )

            from multimodal_fl_security_tpu.data.partition import (
                partition_matching,
            )

            # Per-client test shards whose class mix MATCHES each client's
            # train shard (same-seed partition_data on a different label
            # array does not line up), so each client is scored on its own
            # distribution.
            test_indices = partition_matching(
                train.labels, client_indices, test.labels,
                seed=config.partition_seed,
            )
            test_cd = _stack_shards(
                [test.subset(ix) for ix in test_indices],
                test.num_classes, config.batch_size,
                layout=config.resident_layout,
                resident_dtype=config.resident_dtype,
            )
            pe = personalized_evaluation(
                model, params,
                _dc.replace(spec, local_epochs=config.personalization_epochs),
                client_data, test_cd,
            )
            p_acc = np.asarray(pe["personalized_accuracy"])
            g_acc = np.asarray(pe["global_accuracy"])
            extra_metrics["personalization"] = {
                "personalized_accuracy_mean": float(p_acc.mean()),
                "personalized_accuracy_std": float(p_acc.std()),
                "global_accuracy_on_client_dists_mean": float(g_acc.mean()),
                "personalized_accuracy_per_client": p_acc.tolist(),
                "global_accuracy_per_client": g_acc.tolist(),
                "personalization_epochs": config.personalization_epochs,
            }

        results = ExperimentResults(
            config=config,
            round_accuracies=round_accuracies,
            round_losses=round_losses,
            final_accuracy=round_accuracies[-1] if round_accuracies else 0.0,
            final_loss=round_losses[-1] if round_losses else 0.0,
            attack_success_rate=asr,
            training_time_seconds=time.time() - t0,
            timestamp=datetime.datetime.now().isoformat(),
            extra_metrics=extra_metrics,
        )
        if save:
            os.makedirs(self.results_dir, exist_ok=True)
            stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
            results.save(os.path.join(self.results_dir, f"{config.name}_{stamp}.json"))
        return results

    # ------------------------------------------------------------------
    def run_multi_seed(self, config: ExperimentConfig,
                       seeds: List[int]) -> Dict:
        """Mean/std/95% CI over seeds (reference: run_experiments.py:397-501)."""
        runs = []
        for seed in seeds:
            import dataclasses

            cfg = dataclasses.replace(config, seed=seed,
                                      name=f"{config.name}_seed{seed}")
            runs.append(self.run_simulation(cfg))
        accs = np.array([r.final_accuracy for r in runs])
        asrs = [r.attack_success_rate for r in runs if r.attack_success_rate is not None]
        n = len(accs)
        sem = accs.std(ddof=1) / np.sqrt(n) if n > 1 else 0.0
        out = {
            "config_name": config.name,
            "seeds": seeds,
            "final_accuracy_mean": float(accs.mean()),
            "final_accuracy_std": float(accs.std(ddof=1)) if n > 1 else 0.0,
            "final_accuracy_ci95": float(1.96 * sem),
            "runs": [r.to_dict() for r in runs],
        }
        if asrs:
            a = np.array(asrs)
            out["asr_mean"] = float(a.mean())
            out["asr_std"] = float(a.std(ddof=1)) if len(a) > 1 else 0.0
        return out


def _stack_shards(shards: List[Dataset], num_classes: int, batch_size: int,
                  layout: str = "flat",
                  resident_dtype: Optional[str] = None):
    """Stack a list of (possibly poisoned) per-client datasets."""
    merged_arrays = {}
    for key in shards[0].arrays:
        merged_arrays[key] = np.concatenate([s.arrays[key] for s in shards])
    merged = Dataset(merged_arrays, num_classes)
    offsets = np.cumsum([0] + [len(s) for s in shards])
    indices = [np.arange(offsets[i], offsets[i + 1]) for i in range(len(shards))]
    import jax.numpy as jnp

    return stack_clients(
        merged, indices, pad_multiple=batch_size, layout=layout,
        resident_dtype=(jnp.dtype(resident_dtype).type
                        if resident_dtype else None),
    )


def run_simulation(config: ExperimentConfig, **kwargs) -> ExperimentResults:
    return ExperimentRunner().run_simulation(config, **kwargs)
