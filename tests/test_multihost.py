"""Two-process CPU bring-up of the multi-host path.

Spawns 2 processes that jax.distributed.initialize against a local
coordinator, each with 2 virtual CPU devices (4 global), then runs the
REAL pipeline pieces across them: SemiSupervisedBatcher per-process
strided shards -> put_global_batch (make_array_from_process_local_data)
-> the actual make_train_step jitted over the 4-device global mesh.
Asserts both processes report the SAME loss (global batch + replicated
grads), which a per-host device_put could not produce.

Two variants: a TinyNet smoke (fast; always-on signal for the sharding
machinery) and the PRODUCTION CapsNet at 96^2 with fold_flip + bn_groups=2
(heavy: full-model CPU compile, ~10-20 min cold per process on a 1-core
host, fast once the persistent compile cache is warm).
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

DRIVER = textwrap.dedent(
    """
    import sys
    import jax
    jax.config.update('jax_platforms', 'cpu')
    pid = int(sys.argv[1]); port = sys.argv[2]
    jax.distributed.initialize(
        coordinator_address=f'127.0.0.1:{port}', num_processes=2, process_id=pid,
        # the two workers share ONE core: model build/compile/execution
        # serialize, so the default 300 s shutdown barrier can fire while
        # the trailing worker is still stepping
        shutdown_timeout_seconds=1800,
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4  # 2 procs x 2 local CPU devices

    # Establish the gloo context NOW, while inter-process skew is just
    # the (serialized) import time: gloo's context rendezvous has a hard
    # ~30 s KV-store timeout, but once the context exists the data-plane
    # pairs wait without limit — later minutes-long compile/execution
    # skew between the workers is then harmless.
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices('gloo-bringup')

    import flax.linen as nn
    import jax.numpy as jnp
    import numpy as np
    from picad_tpu.config import LossConfig
    from picad_tpu.data.loader import SemiSupervisedBatcher
    from picad_tpu.parallel.mesh import (
        batch_sharding, create_mesh, put_global_batch, replicated_sharding,
    )
    from picad_tpu.train.optimizer import make_optimizer
    from picad_tpu.train.state import create_train_state
    from picad_tpu.train.step import make_train_step

    model_kind = sys.argv[3]

    class TinyNet(nn.Module):
        # CapsNet call signature; a conv + heads, enough to exercise the
        # step/sharding machinery without a 15-minute CPU compile.
        num_classes: int = 24
        @nn.compact
        def __call__(self, img, classification, concat_labels, epoch,
                     thresh_epoch, train=False):
            b, t, h, w, _ = img.shape
            y = nn.Conv(8, (1, 3, 3), padding='SAME')(img)
            y = jax.nn.relu(y)
            seg = nn.Conv(1, (1, 3, 3), padding='SAME')(y)[..., 0]
            scores = jnp.mean(y, axis=(1, 2, 3)) @ self.param(
                'wcls', nn.initializers.normal(0.1), (8, self.num_classes))
            return seg, scores, None

    class DS:
        def __init__(self, n, labeled, hw):
            self.n, self.labeled, self.hw = n, labeled, hw
        def __len__(self):
            return self.n
        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            h = self.hw
            return {
                'data': rng.random((8, h, h, 3), dtype=np.float32),
                'aug_data': rng.random((8, h, h, 3), dtype=np.float32),
                'loc_msk': (rng.random((8, h, h, 1)) > 0.5).astype(np.float32),
                'action': np.int32(i % 24),
                'label_vid': np.int32(self.labeled),
            }

    mesh = create_mesh()  # all 4 global devices
    repl = replicated_sharding(mesh)
    shard = batch_sharding(mesh)
    if model_kind == 'capsnet':
        # the PRODUCTION model + production step options (fold_flip with
        # per-view BN statistics), small spatial size for CPU compile
        from picad_tpu.models.capsules import CapsNet
        hw, bs, fold, n_steps = 96, 2, True, 1
        model = CapsNet(num_classes=24, bn_groups=2)
    else:
        hw, bs, fold, n_steps = 16, 4, False, 2
        model = TinyNet()
    opt = make_optimizer(1e-3)
    state = create_train_state(model, opt, rng=jax.random.PRNGKey(0),
                               sample_input_shape=(1, 8, hw, hw, 3))
    state = jax.device_put(state, repl)
    step = jax.jit(
        make_train_step(model, opt, LossConfig(bv=True, n_frames=3),
                        fold_flip=fold),
        in_shardings=(repl, shard, None, None),
        out_shardings=(repl, repl),
    )
    # 7 unlabeled -> uneven strided shards (4 vs 3) exercises the
    # lockstep steps_per_epoch + ragged row_mask padding.
    batcher = SemiSupervisedBatcher(
        DS(6, 1, hw), DS(7, 0, hw), batch_size=bs, seed=0, workers=1)
    if model_kind != 'capsnet':
        assert batcher.steps_per_epoch() == 2  # ceil(ceil(7/2)/2)
    losses = []
    for batch in batcher.epoch(1):
        gb = put_global_batch(batch, mesh)
        assert gb['data'].shape[0] == 2 * bs  # per-host rows x 2 processes
        state, metrics = step(
            state, gb, jnp.asarray(1.0, jnp.float32),
            jnp.asarray(0.5, jnp.float32),
        )
        losses.append(float(metrics['loss']))
        if len(losses) >= n_steps:
            break

    if len(sys.argv) > 4:  # checkpoint/resume across both workers
        save_dir = sys.argv[4]
        from picad_tpu.checkpoint.manager import BestCheckpointPolicy
        pol = BestCheckpointPolicy(save_dir, 'val')
        # identical loss on every process => identical policy decisions
        path = pol.maybe_save(1, losses[-1], state)
        assert path is not None, 'first improvement must save'
        assert pol.maybe_save(2, losses[-1] + 1.0, state) is None
        multihost_utils.sync_global_devices('ckpt-written')
        # both workers resume (Trainer.restore flow: host template ->
        # orbax restore -> device_put back onto the global mesh)
        template = jax.device_get(state)
        restored = pol.io.restore(path, template)
        state2 = jax.device_put(restored, repl)
        import numpy as np2
        for a, b in zip(jax.tree.leaves(jax.device_get(state2)),
                        jax.tree.leaves(template)):
            np2.testing.assert_array_equal(np2.asarray(a), np2.asarray(b))
        # one more lockstep step from the restored state on BOTH workers
        gb = put_global_batch(next(iter(batcher.epoch(2))), mesh)
        state2, metrics = step(
            state2, gb, jnp.asarray(2.0, jnp.float32),
            jnp.asarray(0.5, jnp.float32),
        )
        losses.append(float(metrics['loss']))

    print('MULTIHOST_OK', pid, losses)
    """
)


def _run_two_processes(tmp_path, model_kind: str, timeout: int,
                       ckpt: bool = False):
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    )
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    extra = [str(tmp_path / "ckpt")] if ckpt else []

    def attempt():
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = str(s.getsockname()[1])
        procs = [
            subprocess.Popen(
                [sys.executable, str(driver), str(pid), port, model_kind]
                + extra,
                cwd=repo, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
            for pid in range(2)
        ]
        return procs, [p.communicate(timeout=timeout) for p in procs]

    # Cold compiles SERIALIZE on this 1-core host, skewing the two
    # processes by minutes; gloo's ~30 s rendezvous/op timeouts and the
    # distributed-shutdown barrier then fire — an infrastructure
    # limitation of the test host, not a code failure (real multi-host
    # deployments compile concurrently).  Each failed attempt still
    # WRITES the persistent compile cache for every stage it reached
    # (model init -> first collective -> train step), so successive
    # attempts get monotonically further; three attempts bound the
    # worst cold-cache case (init, step, done).
    flaky = (
        "Gloo context initialization failed",
        "Connect timeout",
        "barrier too early",
    )
    for _ in range(3):
        procs, outs = attempt()
        if all(p.returncode == 0 for p in procs):
            break
        if not any(any(f in err for f in flaky) for _, err in outs):
            break
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-3000:]
        assert "MULTIHOST_OK" in out
    # identical global loss on both processes
    line0 = [l for l in outs[0][0].splitlines() if "MULTIHOST_OK" in l][0]
    line1 = [l for l in outs[1][0].splitlines() if "MULTIHOST_OK" in l][0]
    assert line0.split(" ", 2)[2] == line1.split(" ", 2)[2]


@pytest.mark.heavy
def test_two_process_cpu_global_batch(tmp_path):
    _run_two_processes(tmp_path, "tiny", timeout=900)


@pytest.mark.heavy
def test_two_process_ckpt_save_restore(tmp_path):
    """Multi-host checkpoint/resume lockstep: BestCheckpointPolicy's
    process-0 write gating (checkpoint/manager.py) + orbax restore +
    device_put back onto the global mesh on BOTH workers, then one more
    lockstep step from the restored state (DRIVER's argv[4] branch)."""
    _run_two_processes(tmp_path, "tiny", timeout=900, ckpt=True)


@pytest.mark.heavy
def test_two_process_cpu_real_capsnet(tmp_path):
    """The PRODUCTION CapsNet (96^2, fold_flip, per-view BN) through the
    2-process global-batch path — identical losses across processes.
    Cold CPU compile is slow (~10-20 min/process, 1-core host); warm
    runs hit the persistent compile cache."""
    _run_two_processes(tmp_path, "capsnet", timeout=3600)
