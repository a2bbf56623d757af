"""Epoch-level training orchestration.

Mirrors the reference driver (main_ucf101.py:321-456): three datasets
(labeled / unlabeled / validation), CapsNet + losses, Adam +
ReduceLROnPlateau(train loss), exp ramp-up of the consistency weight,
per-epoch validation with mean binary-mask IoU (NaN-filtered like
main_ucf101.py:261-266), and best-val / best-train checkpointing with the
e<20 deletion rule.

TPU-first differences: one jitted train step (no host round-trips),
batches sharded over the data mesh, full train-state checkpoints (adds
resume, which the reference lacks).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from picad_tpu.checkpoint.manager import BestCheckpointPolicy
from picad_tpu.config import TrainConfig
from picad_tpu.data.loader import PrefetchLoader, SemiSupervisedBatcher, collate
from picad_tpu.eval.metrics import binary_mask_iou
from picad_tpu.models.capsules import CapsNet
from picad_tpu.objectives.ramp_ups import exp_rampup
from picad_tpu.parallel.mesh import batch_sharding, create_mesh, replicated_sharding
from picad_tpu.train.optimizer import ReduceLROnPlateau, make_optimizer
from picad_tpu.train.state import create_train_state
from picad_tpu.train.step import make_train_step, make_val_step
from picad_tpu.utils.logging import MetricLogger
from picad_tpu.utils.profiling import StepTimer


class Trainer:
    def __init__(
        self,
        cfg: TrainConfig,
        *,
        labeled_dataset,
        unlabeled_dataset,
        val_dataset=None,
        use_wandb: bool = False,
    ):
        self.cfg = cfg
        cfg.validate()  # fail fast before any compilation
        import jax.numpy as jnp_

        compute_dtype = {
            "bfloat16": jnp_.bfloat16,
            "float32": jnp_.float32,
        }[cfg.model.compute_dtype]
        self.model = CapsNet(
            num_classes=cfg.model.num_classes,
            pose_size=cfg.model.pose_size,
            compute_dtype=compute_dtype,
            dropout_rate=cfg.model.dropout_rate,
            bn_groups=2 if cfg.fold_flip else 1,
            remat_encoder=cfg.model.remat_encoder,
        )
        self.optimizer = make_optimizer(
            cfg.optim.lr, eps=cfg.optim.adam_eps, weight_decay=cfg.optim.weight_decay
        )
        self.mesh = create_mesh(cfg.parallel.num_devices, cfg.parallel.mesh_axis)
        self.batch_sharding = batch_sharding(self.mesh, cfg.parallel.mesh_axis)
        self.replicated = replicated_sharding(self.mesh)

        rng = jax.random.PRNGKey(cfg.seed)
        self.state = create_train_state(
            self.model,
            self.optimizer,
            rng=rng,
            sample_input_shape=(1, cfg.data.depth, cfg.data.clip_height,
                                cfg.data.clip_width, 3),
        )
        if cfg.model.pretrained_i3d:
            self._load_pretrained_i3d(cfg.model.pretrained_i3d)
        self.state = jax.device_put(self.state, self.replicated)

        step_fn = make_train_step(
            self.model, self.optimizer, cfg.loss, fold_flip=cfg.fold_flip
        )
        self.train_step = jax.jit(
            step_fn,
            in_shardings=(self.replicated, self.batch_sharding, None, None),
            out_shardings=(self.replicated, self.replicated),
            donate_argnums=(0,),
        )
        self.val_step = jax.jit(
            make_val_step(self.model, cfg.loss),
            in_shardings=(self.replicated, self.batch_sharding, None),
            out_shardings=(self.batch_sharding, self.replicated),
        )

        self.batcher = SemiSupervisedBatcher(
            labeled_dataset,
            unlabeled_dataset,
            batch_size=cfg.bs,
            seed=cfg.seed,
            workers=cfg.data.workers,
            force_stream_flags=cfg.data.dataset == "jhmdb",
        )
        self.val_dataset = val_dataset
        self.ramp = exp_rampup(cfg.epochs)
        self.scheduler = ReduceLROnPlateau(
            cfg.optim.lr,
            factor=cfg.optim.plateau_factor,
            patience=cfg.optim.plateau_patience,
            min_lr=cfg.optim.plateau_min_lr,
            threshold=cfg.optim.plateau_threshold,
        )

        save_dir = os.path.join(
            cfg.save_root, cfg.exp_id, time.strftime("%m-%d-%H-%M")
        )
        os.makedirs(save_dir, exist_ok=True)
        self.save_dir = save_dir
        self.logger = MetricLogger(save_dir, use_wandb=use_wandb)
        self.best_val = BestCheckpointPolicy(
            save_dir, "val", cfg.keep_all_after_epoch
        )
        self.best_train = BestCheckpointPolicy(
            save_dir, "train", cfg.keep_all_after_epoch
        )

    def _load_pretrained_i3d(self, path: str) -> None:
        from picad_tpu.checkpoint.torch_convert import (
            convert_i3d_backbone,
            load_torch_state_dict,
            merge_into_variables,
        )

        sd = load_torch_state_dict(path)
        params, stats, n = convert_i3d_backbone(sd)
        merged = merge_into_variables(
            {"params": self.state.params, "batch_stats": self.state.batch_stats},
            params,
            stats,
        )
        self.state = self.state.replace(
            params=merged["params"], batch_stats=merged["batch_stats"]
        )
        print(f"Loaded I3D pretrained weights from {path} for {n} tensors")

    # ---- epochs ----

    def train_epoch(self, epoch: int) -> float:
        cfg = self.cfg
        wt_ramp = jnp.asarray(self.ramp(epoch), jnp.float32)
        epoch_arr = jnp.asarray(epoch, jnp.float32)
        loader = PrefetchLoader(
            self.batcher.epoch(epoch),
            sharding=self.batch_sharding,
            prefetch=cfg.data.prefetch,
        )
        steps = self.batcher.steps_per_epoch()
        timer = StepTimer(clips_per_step=cfg.bs, n_chips=self.mesh.size)
        running: list[dict] = []
        t0 = time.time()
        for batch_id, batch in enumerate(loader):
            self.state, metrics = self.train_step(
                self.state, batch, epoch_arr, wt_ramp
            )
            running.append(metrics)
            timer.tick()
            if (batch_id + 1) % cfg.pf == 0:
                host = {
                    k: float(np.mean([float(m[k]) for m in running]))
                    for k in running[0]
                }
                tput = timer.report()
                print(
                    f"[TRAIN] epoch-{epoch}/{cfg.epochs}, "
                    f"batch-{batch_id + 1}/{steps}, "
                    f"loss-{host['loss']:.3f}, acc-{host['acc']:.3f}\t"
                    f"[LOSS] cls-{host['loss_cls']:.3f}, "
                    f"seg-{host['loss_seg']:.3f}, "
                    f"const-{host['loss_consistency']:.3f}  "
                    f"({tput['clips_per_sec']:.1f} clips/s)",
                    flush=True,
                )
                total_step = (epoch - 1) * steps + batch_id + 1
                self.logger.log("train/loss", {
                    k: host[k] for k in
                    ("loss", "loss_seg", "loss_cls", "loss_consistency")
                }, total_step)
                self.logger.log("train/acc", {"acc": host["acc"]}, total_step)
        print("Training time: ", time.time() - t0)
        if not running:
            return float("inf")
        return float(np.mean([float(m["loss"]) for m in running]))

    def validate(self, epoch: int) -> float:
        if self.val_dataset is None:
            return float("inf")
        cfg = self.cfg
        totals, accs = [], []
        total_iou, valid_iou = 0.0, 0
        t0 = time.time()
        n = len(self.val_dataset)
        bs = cfg.bs
        for i in range(0, n, bs):  # fixed batch => single compile
            idx = list(range(i, min(i + bs, n)))
            samples = [self.val_dataset[j] for j in idx]
            n_real = len(samples)
            while len(samples) < bs:  # zero-pad the ragged final batch
                samples.append(
                    {k: np.zeros_like(v) for k, v in samples[0].items()}
                )
            batch = collate(samples)
            row_mask = np.zeros((bs,), np.float32)
            row_mask[:n_real] = 1.0
            batch = jax.device_put(batch, self.batch_sharding)
            seg_bin, metrics = self.val_step(
                self.state, batch, jnp.asarray(row_mask)
            )
            totals.append(float(metrics["loss"]))
            accs.append(float(metrics["acc"]))
            seg_np = np.asarray(seg_bin)
            gt_np = np.asarray(batch["loc_msk"])[..., 0]
            for a in range(n_real):
                iou = binary_mask_iou(gt_np[a], seg_np[a])
                if iou == iou:
                    total_iou += iou
                    valid_iou += 1
        print("Validation time: ", time.time() - t0)
        if not totals:
            return float("inf")
        avg_iou = total_iou / max(valid_iou, 1)
        val_loss = float(np.mean(totals))
        print(
            f"[VAL] epoch-{epoch}, loss-{val_loss:.3f}, "
            f"acc-{float(np.mean(accs)):.3f} [IOU ] {avg_iou:.3f}",
            flush=True,
        )
        self.logger.log(
            "val", {"loss": val_loss, "acc": float(np.mean(accs)),
                    "iou": avg_iou}, epoch
        )
        return val_loss

    def restore(self, path: str) -> int:
        """Resume from a full-train-state checkpoint (the reference has no
        resume — its .pth files hold bare params, main_ucf101.py:439-455).
        Returns the next epoch to run."""
        template = jax.device_get(self.state)
        restored = self.best_val.io.restore(path, template)
        self.state = jax.device_put(restored, self.replicated)
        next_epoch = int(restored.epoch) + 1
        print(f"Resumed from {path} at epoch {next_epoch}")
        return next_epoch

    def fit(self, start_epoch: int = 1) -> None:
        epochs = range(start_epoch, self.cfg.epochs + 1)
        try:
            from tqdm import tqdm

            epochs = tqdm(epochs)
        except ImportError:
            pass
        for e in epochs:
            train_loss = self.train_epoch(e)
            val_loss = self.validate(e)
            self.state = self.state.replace(
                epoch=jax.numpy.asarray(e, jax.numpy.int32)
            )
            host_state = jax.device_get(self.state)
            if self.best_val.maybe_save(e, val_loss, host_state):
                print("Yay!!! Got the val loss down...")
            if self.best_train.maybe_save(e, train_loss, host_state):
                print("Yay!!! Got the train loss down...")
            new_lr = self.scheduler.step(train_loss)
            if abs(new_lr - self.state.learning_rate()) > 1e-6 * new_lr:
                self.state = self.state.with_learning_rate(new_lr)
                print(f"ReduceLROnPlateau: lr -> {new_lr:.2e}")
