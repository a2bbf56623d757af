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
from picad_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    local_rows,
    put_global_batch,
    replicated_sharding,
)
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
        watch: bool = False,
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

        # Device-resident video cache (data/device_cache.py): datasets
        # carry `.cache`; batches are ~100-byte clip metadata that a
        # tiny jitted assembler program turns into plain pixel batches
        # on the loader's prefetch thread — the TRAIN STEP is the same
        # program as the streaming path (see assemble_batch for why
        # in-step assembly lost ~9 ms/step to relayout copies).
        cache = getattr(labeled_dataset, "cache", None)
        self._assemble_put = None
        if cache is not None:
            from picad_tpu.data.device_cache import make_assembler_put

            pools = jax.device_put(
                {
                    "pool_video": cache.pool_video,
                    "pool_mask": cache.pool_mask,
                },
                self.replicated,
            )
            self._assemble_put = make_assembler_put(
                pools,
                (cfg.data.clip_height, cfg.data.clip_width),
                sharding=self.batch_sharding,
                put_batch=lambda b: put_global_batch(b, self.mesh),
            )
        # --watch: the reference's wandb.watch(model) (main_jhmdb.py:422)
        # = periodic param/grad magnitude logging.  grad_metrics folds a
        # global grad-norm reduction into the step; param norms are
        # histogrammed host-side every pf batches (MetricLogger.watch_params).
        self._watch = watch
        step_fn = make_train_step(
            self.model, self.optimizer, cfg.loss, fold_flip=cfg.fold_flip,
            grad_metrics=watch,
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
        # derived run name like the reference (main_jhmdb.py:413-415)
        self.logger = MetricLogger(
            save_dir, use_wandb=use_wandb,
            run_name=f"{cfg.exp_id}_{cfg.data.dataset}_bs{cfg.bs}",
        )
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
        # rgb_charades.pt carries the full I3D: every Unit3D has a conv
        # kernel + 4 BN tensors; our Mixed_4f-truncated backbone keeps 45
        # conv layers (tests/test_model_parity.py asserts the same count).
        # A wrong path or an incompatible state_dict must not silently
        # fall back to training from scratch.
        if n == 0:
            raise ValueError(
                f"pretrained I3D checkpoint {path!r} yielded 0 matching "
                "tensors — wrong file or incompatible state_dict"
            )
        if n < 45 * 5:
            raise ValueError(
                f"pretrained I3D checkpoint {path!r} yielded only {n} "
                "tensors (expected 225 = 45 Unit3Ds x [conv kernel + 4 BN "
                "tensors] for a Mixed_4f-truncated I3D)"
            )
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
            put_fn=self._assemble_put
            or (lambda b: put_global_batch(b, self.mesh)),
        )
        steps = self.batcher.steps_per_epoch()
        timer = StepTimer(clips_per_step=cfg.bs, n_chips=self.mesh.size)
        running: list[dict] = []
        t0 = time.time()
        # --profile_dir: trace warm steps [3, 8) of the first epoch run
        profiling = bool(cfg.profile_dir) and not getattr(
            self, "_profiled", False
        )
        self._profiled = True
        trace_open = False
        for batch_id, batch in enumerate(loader):
            if profiling and batch_id == 3:
                jax.profiler.start_trace(cfg.profile_dir)
                trace_open = True
            self.state, metrics = self.train_step(
                self.state, batch, epoch_arr, wt_ramp
            )
            running.append(metrics)
            if trace_open and batch_id == 7:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                trace_open = False
                print(f"Profiler trace written to {cfg.profile_dir}")
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
                if self._watch:
                    self.logger.log(
                        "train/grad", {"grad_norm": host["grad_norm"]},
                        total_step,
                    )
                    self.logger.watch_params(
                        jax.device_get(self.state.params), total_step
                    )
        if trace_open:  # epoch shorter than the trace window
            jax.profiler.stop_trace()
            print(f"Profiler trace written to {cfg.profile_dir}")
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
        bs = cfg.bs  # per-host batch
        # Multi-host: each process validates its strided shard; the val
        # step reduces loss/acc over the GLOBAL batch (row-masked), so
        # metrics come back identical on every process.
        pidx, pcnt = jax.process_index(), jax.process_count()
        my = list(range(pidx, n, pcnt))
        longest_shard = -(-n // pcnt)  # ceil: process 0's shard
        steps = max(-(-longest_shard // bs), 1)
        # Same worker pool the training batcher gets: decode (cv2/ffmpeg)
        # releases the GIL, so validation fetches overlap each other and
        # the running val_step instead of serializing on the main thread.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max(cfg.data.workers, 1)) as pool:
            for s in range(steps):  # fixed batch + step count => no deadlock
                idx = my[s * bs : (s + 1) * bs]
                samples = list(pool.map(self.val_dataset.__getitem__, idx))
                n_real = len(samples)
                if n_real == 0:  # short shard: all-pad step, stay in lockstep
                    # zero_sample() is a pure shape template — fetching
                    # self.val_dataset[0] here would decode a full video
                    # inside this edge case on real data
                    mk = getattr(self.val_dataset, "zero_sample", None)
                    samples = [
                        mk() if mk is not None else {
                            k: np.zeros_like(v)
                            for k, v in self.val_dataset[0].items()
                        }
                    ]
                while len(samples) < bs:  # zero-pad the ragged final batch
                    samples.append(
                        {k: np.zeros_like(v) for k, v in samples[0].items()}
                    )
                batch = collate(samples)
                row_mask = np.zeros((bs,), np.float32)
                row_mask[:n_real] = 1.0
                gt_np = batch["loc_msk"][..., 0]  # host copy before device_put
                batch["row_mask"] = row_mask
                batch = put_global_batch(batch, self.mesh)
                seg_bin, metrics = self.val_step(
                    self.state, batch, batch["row_mask"]
                )
                totals.append(float(metrics["loss"]))
                accs.append(float(metrics["acc"]))
                seg_np = local_rows(seg_bin)
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
        # Full scheduler continuity: counters + live LR come back from the
        # state, so a resumed run reduces the LR at the SAME epoch an
        # unbroken run would (tests/test_checkpoint.py).
        restored.load_scheduler(self.scheduler)
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
        try:
            for e in epochs:
                train_loss = self.train_epoch(e)
                val_loss = self.validate(e)
                # Scheduler BEFORE checkpointing (the reference steps after
                # saving, main_ucf101.py:456, but its .pth holds no
                # scheduler; stepping first makes the saved state the exact
                # point an unbroken run passes through, so --resume never
                # loses a plateau step).  Params/losses are unaffected —
                # only opt_state's LR and the mirrored counters change.
                new_lr = self.scheduler.step(train_loss)
                if abs(new_lr - self.state.learning_rate()) > 1e-6 * new_lr:
                    self.state = self.state.with_learning_rate(new_lr)
                    print(f"ReduceLROnPlateau: lr -> {new_lr:.2e}")
                self.state = self.state.replace(
                    epoch=jax.numpy.asarray(e, jax.numpy.int32)
                ).with_scheduler(self.scheduler)
                host_state = jax.device_get(self.state)
                if self.best_val.maybe_save(e, val_loss, host_state):
                    print("Yay!!! Got the val loss down...")
                if self.best_train.maybe_save(e, train_loss, host_state):
                    print("Yay!!! Got the train loss down...")
        finally:
            self.logger.close()
