"""Data-parallel evaluation (eval/runner.py make_eval_fn(mesh=...)).

Eval mode has no cross-sample reductions (BN runs on running stats,
dropout off), so sharding the clip batch over a mesh must reproduce the
single-device outputs exactly — verified on a virtual 8-device CPU mesh
in a subprocess (the platform must be chosen before JAX initializes).
"""

import os
import subprocess
import sys

import pytest

_CHILD = r"""
import jax
jax.config.update('jax_platforms', 'cpu')
import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from picad_tpu.eval.runner import make_padded_forward, _mesh_or_none


class TinySig(nn.Module):
    num_classes: int = 24

    @nn.compact
    def __call__(self, img, classification, concat_labels, epoch,
                 thresh_epoch, train=False):
        y = nn.Conv(8, (1, 3, 3), padding='SAME')(img)
        y = jax.nn.relu(y)
        seg = nn.Conv(1, (1, 3, 3), padding='SAME')(y)[..., 0]
        scores = y.mean(axis=(1, 2, 3)) @ self.param(
            'wcls', nn.initializers.normal(0.1), (8, self.num_classes))
        return seg, scores, None


assert len(jax.devices()) == 8, jax.devices()
model = TinySig()
variables = model.init(
    jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 16, 3)),
    jnp.zeros((1,), jnp.int32), jnp.zeros((1,)), 0, 0, False,
)
variables = {'params': variables['params'],
             'batch_stats': variables.get('batch_stats', {})}

single = make_padded_forward(model, variables, clip_batch_size=8)
mesh = _mesh_or_none(8)
assert mesh is not None and mesh.size == 8
sharded = make_padded_forward(
    model, variables, clip_batch_size=8, mesh=mesh)

rng = np.random.default_rng(5)
for n in (8, 3, 1):  # full, ragged, minimal
    clips = rng.random((n, 8, 16, 16, 3), dtype=np.float32)
    seg_a, sc_a = single(clips)
    seg_b, sc_b = sharded(clips)
    np.testing.assert_array_equal(seg_a, seg_b)
    np.testing.assert_array_equal(sc_a, sc_b)

# indivisible clip_batch_size must fail fast
try:
    make_padded_forward(model, variables, clip_batch_size=6, mesh=mesh)
except ValueError as e:
    assert 'divide' in str(e)
else:
    raise AssertionError('indivisible clip_batch_size accepted')

print('eval_dp ok')
"""


def test_eval_dp_matches_single_device():
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "eval_dp ok" in proc.stdout


def test_mesh_or_none_gates():
    from picad_tpu.eval.runner import _mesh_or_none

    assert _mesh_or_none(0) is None
    assert _mesh_or_none(1) is None
    with pytest.raises(ValueError, match="visible devices"):
        _mesh_or_none(10_000)
