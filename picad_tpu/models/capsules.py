"""Capsule localization head: PrimaryCaps, EM-routed ConvCaps, CapsNet.

TPU-native re-design of the reference capsule network
(models/capsules_ucf101.py).  The reference's capsule tensors are already
channel-last ((B, h, w, caps*(P*P+1))), so the math carries over directly
onto our channels-last layout; the torch-specific mechanics (patch
extraction that is a no-op for K=(1,1), `.repeat`-based vote matmuls,
python-list class masking) are replaced by reshapes, one einsum, and
vectorized one-hot selects.

Structure (reference line refs):
- PrimaryCaps (:10-49): two 9x9 VALID convs over the 28x28x832 Mixed_4f
  map: pose (832->B_caps*P*P=512) and activation (832->32, sigmoid);
  output (B, 20, 20, 544).
- ConvCaps (:52-331) with K=(1,1), C classes, P=4, 3 EM iterations: votes
  v[n,i,j] = pose[n,i] @ W[i,j] (4x4 matmuls, einsum), then EM routing
  (picad_tpu.ops.em_routing); output (B, 20, 20, C*16 + C).
- CapsNet (:334-512): I3D@Mixed_4f encoder, class scores = spatial mean
  of capsule activations (:450-451), class-conditional pose masking with
  a pseudo-label switch at `thresh_epoch` (:455-479), transposed-conv
  decoder with 3 skip connections -> (B, 8, 224, 224) seg logits.

`num_classes` is 24 for UCF101-24 and 21 for JHMDB-21 (the reference's
JHMDB model module is missing from its repo — main_jhmdb.py:369 imports
`models.capsules_jhmdb_semi_sup_pa` — so this parameterization is the
reconstructed equivalent).
"""

from __future__ import annotations

import os
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from picad_tpu.models.i3d import InceptionI3d
from picad_tpu.models.layers import Dropout3d
from picad_tpu.ops.convops import conv_nd, conv_transpose_nd
from picad_tpu.ops.em_routing import em_routing
from picad_tpu.ops.fused_head import fused_decoder_head
from picad_tpu.ops.tapconv import tap_conv_valid


def _torch_conv_uniform(fan_in: int):
    """torch's default Conv/ConvTranspose init: U(-1/sqrt(fan_in), +)."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / (fan_in ** 0.5)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _normal(stddev: float):
    return nn.initializers.normal(stddev=stddev)


# PrimaryCaps conv formulation, read at TRACE time (tools/ab_primarycaps.py
# flips it between jit traces): True = two separate pose/act convs — the
# default and measured winner (full-step A/B on v5e, 2026-08-19: split
# 71.87 ms vs merged 76.78 ms, −4.9 ms; consistent with the round-3
# standalone measurement that first found merged +1.5 ms slower — 544
# output channels pad to five 128-lane tiles vs four for 512, and the
# second read of x is cheaper than the wasted lane tile).  False = the
# merged 544-channel conv, kept as the A/B counterfactual.  Same math
# either way (per-output-channel reductions are independent); exact on
# the default TPU path, float-reassociation-level deltas under
# highest-precision f32 (tests/test_convcaps_modes.py).
_PCAPS_SPLIT = os.environ.get("PICAD_PCAPS_SPLIT", "1") == "1"


class PrimaryCaps(nn.Module):
    """Primary capsule layer: pose + sigmoid activation convs (ref :10-49)."""

    caps_types: int = 32  # B in the reference
    pose_size: int = 4  # P
    kernel: int = 9
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: (B, 28, 28, 832)
        cin = x.shape[-1]
        k = self.kernel
        psize = self.pose_size * self.pose_size
        fan_in = cin * k * k
        wp = self.param(
            "pose_kernel", _normal(0.1), (k, k, cin, self.caps_types * psize)
        )
        bp = self.param(
            "pose_bias", _torch_conv_uniform(fan_in), (self.caps_types * psize,)
        )
        wa = self.param("a_kernel", _normal(0.1), (k, k, cin, self.caps_types))
        ba = self.param("a_bias", _torch_conv_uniform(fan_in), (self.caps_types,))
        dt = self.compute_dtype
        xc = x.astype(dt)
        psz = self.caps_types * psize
        if _PCAPS_SPLIT:
            # Two separate convs (pose 832->512, act 832->32), the
            # literal reference structure — the measured DEFAULT (see the
            # _PCAPS_SPLIT comment above for the A/B record).
            # tap_conv_valid dispatches the literal XLA conv by default
            # (the Pallas tap-GEMM kernels lost their hardware A/B,
            # ops/tapconv.py:76-88).
            p = tap_conv_valid(xc, wp.astype(dt)) + bp
            a = jax.nn.sigmoid(tap_conv_valid(xc, wa.astype(dt)) + ba)
        else:
            # A/B counterfactual: ONE merged 544-channel conv, x read
            # once for both heads — measured 4.9 ms SLOWER in-context
            # (lane-tile padding, see above).
            pa = tap_conv_valid(xc, jnp.concatenate(
                [wp, wa], axis=-1).astype(dt))
            p = pa[..., :psz] + bp
            a = jax.nn.sigmoid(pa[..., psz:] + ba)
        # (B, 20, 20, caps*psize + caps) — already channel-last like the
        # reference's permute(0, 2, 3, 1) output (:47-49).
        return jnp.concatenate([p, a], axis=-1)


class ConvCaps(nn.Module):
    """Matrix-capsule layer with EM routing (ref :52-331).

    Three modes, mirroring the reference class:
    - K=(1,1) convolutional (the mode CapsNet uses): pure reshape, one
      vote einsum, EM routing per spatial position.
    - general K convolutional: KxK patches of capsules route jointly.
      (The reference's generic-K path is dead code whose permute+view at
      :228,:301 scrambles the patch axis order; we implement the correct
      patch semantics instead of replicating that latent bug.)
    - `w_shared` "class caps" (ref :310-329): all h*w positions share one
      transformation matrix per capsule type, optional scaled coordinate
      addition (ref add_coord :270-288), and the layer returns only the C
      output activations.
    """

    in_caps: int = 32  # B
    out_caps: int = 24  # C
    pose_size: int = 4  # P
    kernel: tuple = (1, 1)
    stride: tuple = (1, 1)
    iters: int = 3
    eps: float = 1e-8
    lam: float = 1e-6
    coor_add: bool = False
    w_shared: bool = False
    # dtype of the vote tensor and the routing's large elementwise
    # passes (ops/em_routing.py mixed-precision contract: the (b, C)
    # cost/activation chain always runs f32).  bf16 in production halves
    # the dominant HBM traffic of the capsule head; f32 (default) is the
    # bit-parity configuration the oracle tests pin down.
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, B_caps*(psize+1))
        P = self.pose_size
        psize = P * P
        Bi, C = self.in_caps, self.out_caps
        b, h, w, c = x.shape
        assert c == Bi * (psize + 1), (c, Bi, psize)

        beta_u = self.param("beta_u", nn.initializers.normal(1.0), (C, psize))
        beta_a = self.param("beta_a", nn.initializers.normal(1.0), (C,))

        cdt = self.compute_dtype

        def routed_votes(pose, act, weights, coords=None):
            """pose (n, Bi', P, P), act (n, Bi', 1) -> (mu, a_out)."""
            v = jnp.einsum(
                "nipq,ijqr->nijpr",
                pose.astype(cdt),
                weights.astype(cdt),
                preferred_element_type=cdt,
            ).reshape(pose.shape[0], pose.shape[1], C, psize)
            if coords is not None:
                v = v + coords.astype(cdt)
            return em_routing(
                v, act.astype(cdt), beta_u, beta_a,
                iters=self.iters, eps=self.eps, lam=self.lam,
            )

        if not self.w_shared:
            K0, K1 = self.kernel
            s0, s1 = self.stride
            weights = self.param(
                "weights", nn.initializers.normal(1.0), (K0 * K1 * Bi, C, P, P)
            ) if (K0, K1) != (1, 1) else self.param(
                "weights", nn.initializers.normal(1.0), (Bi, C, P, P)
            )
            if (K0, K1) == (1, 1):
                pose = x[..., : Bi * psize].reshape(b * h * w, Bi, P, P)
                act = x[..., Bi * psize :].reshape(b * h * w, Bi, 1)
                oh, ow = h, w
            else:
                oh = (h - K0) // s0 + 1
                ow = (w - K1) // s1 + 1
                patches = jnp.stack(
                    [
                        x[:, i : i + s0 * oh : s0, j : j + s1 * ow : s1, :]
                        for i in range(K0)
                        for j in range(K1)
                    ],
                    axis=3,
                )  # (b, oh, ow, K0*K1, c)
                pose = patches[..., : Bi * psize].reshape(
                    b * oh * ow, K0 * K1 * Bi, P, P
                )
                act = patches[..., Bi * psize :].reshape(
                    b * oh * ow, K0 * K1 * Bi, 1
                )
            mu, a_out = routed_votes(pose, act, weights)
            p_out = mu.reshape(b, oh, ow, C * psize)
            a_out = a_out.reshape(b, oh, ow, C)
            return jnp.concatenate([p_out, a_out], axis=-1)

        # ---- class-caps mode (w_shared) ----
        weights = self.param(
            "weights", nn.initializers.normal(1.0), (Bi, C, P, P)
        )
        # (b, h*w, Bi, P, P): one shared W per capsule type across positions
        pose = x[..., : Bi * psize].reshape(b, h * w, Bi, P, P)
        act = x[..., Bi * psize :].reshape(b, h * w * Bi, 1)
        coords = None
        if self.coor_add:
            # ref add_coord :270-288: vote entry 0 += i/h, entry 1 += j/w
            coord = jnp.zeros((h, w, psize), jnp.float32)
            coord = coord.at[:, :, 0].add(
                (jnp.arange(h, dtype=jnp.float32) / h)[:, None]
            )
            coord = coord.at[:, :, 1].add(
                (jnp.arange(w, dtype=jnp.float32) / w)[None, :]
            )
            coords = jnp.broadcast_to(
                coord.reshape(1, h * w, 1, 1, psize), (b, h * w, Bi, C, psize)
            ).reshape(b, h * w * Bi, C, psize)
        v = jnp.einsum(
            "nsipq,ijqr->nsijpr",
            pose.astype(cdt),
            weights.astype(cdt),
            preferred_element_type=cdt,
        ).reshape(b, h * w * Bi, C, psize)
        if coords is not None:
            v = v + coords.astype(cdt)
        _, a_out = em_routing(
            v, act.astype(cdt), beta_u, beta_a,
            iters=self.iters, eps=self.eps, lam=self.lam,
        )
        return a_out  # (B, C) f32


class CapsNet(nn.Module):
    """Full model: I3D encoder + capsule head + skip decoder (ref :334-512)."""

    num_classes: int = 24
    pose_size: int = 4
    compute_dtype: Any = jnp.float32
    dropout_rate: float = 0.5
    # >1 when original+flipped views are folded into one batch: BatchNorm
    # then computes per-view statistics (see TorchBatchNorm.stats_groups),
    # keeping exact two-forward reference numerics at one-dispatch cost.
    bn_groups: int = 1
    # Fuse upsample4+Dropout3d+smooth into one exact op (ops/fused_head.py).
    # False = the literal ConvT chain (parity baseline; also the reference
    # execution order, main path is tested equal to it).
    fused_head: bool = True
    # rematerialize the I3D encoder in the backward pass: trades ~30%
    # extra encoder FLOPs for not storing its activations — enables much
    # larger per-chip batches (jax.checkpoint / flax nn.remat)
    remat_encoder: bool = False

    @nn.compact
    def __call__(
        self,
        img: jax.Array,  # (B, T=8, 224, 224, 3)
        classification: jax.Array,  # (B,) int class labels (gt; dummy at eval)
        concat_labels: jax.Array,  # (B,) 1 = labeled, 0 = unlabeled
        epoch: jax.Array,  # scalar; pseudo-labels switch on at thresh_epoch
        thresh_epoch: jax.Array,
        train: bool = False,
    ):
        """Returns (seg_logits (B, T, H, W), class_scores (B, C),
        feat (B, h*w, C)).

        Input must be (B, 8, H, W, 3) with H, W divisible by 16 and
        H/8 - 8 >= 1 (the capsule grid after the 9x9 VALID convs);
        the reference shape is H = W = 224 (grid 20x20)."""
        P = self.pose_size
        psize = P * P
        caps = self.num_classes
        dt = self.compute_dtype
        B_in, T_in, H_in, W_in = img.shape[:4]
        if img.dtype == jnp.uint8:
            # packed S2D uint8 views (train/step.py prepare_views): the
            # logical clip dims are 2x the packed dims
            T_in, H_in, W_in = 2 * T_in, 2 * H_in, 2 * W_in
        assert T_in == 8, "the I3D/decoder temporal schedule requires T=8"

        encoder_cls = InceptionI3d
        if self.remat_encoder:
            encoder_cls = nn.remat(InceptionI3d, static_argnums=(2,))
        x, cross56, cross112 = encoder_cls(
            final_endpoint="Mixed_4f", name="conv1", compute_dtype=dt,
            bn_groups=self.bn_groups,
        )(img, train)

        b = x.shape[0]
        h28, w28 = H_in // 8, W_in // 8  # 28x28 at the reference size
        x = x.reshape(b, h28, w28, 832)  # T=1 at Mixed_4f
        # channelwise dropout AFTER the 4-D reshape: identical semantics
        # (mask is per (sample, channel) either way), but the 5-D site
        # anchored a pathological batch-second-minor relayout fusion
        # (~5 ms/step in the device trace)
        x = Dropout3d(self.dropout_rate, name="drop_enc")(x, deterministic=not train)
        cross28 = x
        x = PrimaryCaps(32, P, 9, compute_dtype=dt, name="primary_caps")(x)
        # caps_reorder (ref :399-410) is an effective identity for this
        # layout — the pose slice computes to all 544 channels — so it is
        # intentionally omitted.
        combined = ConvCaps(32, caps, P, name="conv_caps", compute_dtype=dt)(x)

        h, w = combined.shape[1], combined.shape[2]
        ranges = caps * psize
        activations = combined[..., ranges : ranges + caps]  # (B, h, w, caps)
        poses = combined[..., :ranges]

        feat = activations.reshape(b, h * w, caps)
        class_scores = jnp.mean(activations, axis=(1, 2))  # (B, caps)

        one_hot_pred = jax.nn.one_hot(
            jnp.argmax(class_scores, axis=1), caps, dtype=jnp.float32
        )
        if train:
            one_hot_gt = jax.nn.one_hot(
                classification.astype(jnp.int32).reshape(b), caps, dtype=jnp.float32
            )
            # epoch counts from 1; pseudo-labels replace all-ones masks for
            # unlabeled rows once epoch >= thresh_epoch (ref :459-464).
            unlabeled_mask = jnp.where(
                epoch < thresh_epoch, jnp.ones_like(one_hot_gt), one_hot_pred
            )
            sel = (concat_labels.reshape(b, 1) == 0).astype(jnp.float32)
            class_mask = sel * unlabeled_mask + (1.0 - sel) * one_hot_gt
        else:
            class_mask = one_hot_pred

        poses = poses.reshape(b, h, w, caps, psize)
        poses = poses * class_mask[:, None, None, :, None]
        poses = poses.reshape(b, h, w, ranges)  # (B, 20, 20, caps*16)

        # ---- Decoder (ref :358-374, :486-509) ----
        relu = jax.nn.relu

        def ct(name, x, cin, cout, kernel, stride, padding, output_padding, nd):
            kshape = (kernel,) * nd + (cin, cout)
            kw = self.param(f"{name}_kernel", _normal(0.02), kshape)
            fan_in = cout * kernel**nd  # torch fan-in for ConvTranspose bias
            kb = self.param(f"{name}_bias", _torch_conv_uniform(fan_in), (cout,))
            if (
                nd == 3
                and x.shape[1] == 1
                and (kernel, stride, padding, output_padding) == (3, 2, 1, 1)
            ):
                # T_in=1 (upsample2): the temporal scatter t = 2i-1+alpha
                # factorizes — output frame t comes solely from kernel
                # slice alpha = t+1, and slice 0's target (t=-1) is
                # cropped (zero gradient, as in torch).  Two 2-D ConvTs
                # replace the 3-D one: exact values/grads, 1/3 the FLOPs.
                x2 = x[:, 0].astype(dt)
                y0 = conv_transpose_nd(x2, kw[1].astype(dt), 2, 1, 1)
                y1 = conv_transpose_nd(x2, kw[2].astype(dt), 2, 1, 1)
                return jnp.stack([y0, y1], axis=1) + kb
            y = conv_transpose_nd(
                x.astype(dt), kw.astype(dt), stride, padding, output_padding
            )
            return y + kb

        def conv(name, x, cin, cout, kernel, nd):
            kshape = (kernel,) * nd + (cin, cout)
            fan_in = cin * kernel**nd
            kw = self.param(f"{name}_kernel", _torch_conv_uniform(fan_in), kshape)
            kb = self.param(f"{name}_bias", _torch_conv_uniform(fan_in), (cout,))
            if nd == 3 and kernel == 3:
                # conv56/conv112: 64-channel outputs idle half the MXU;
                # width packing (ops/wpack.py, PICAD_WPACK=1) runs them
                # at full lanes, exactly.  Off (default) = direct conv.
                from picad_tpu.ops.wpack import decoder_conv3d

                return decoder_conv3d(x.astype(dt), kw.astype(dt)) + kb
            y = conv_nd(x.astype(dt), kw.astype(dt), 1, kernel // 2)
            return y + kb

        # upsample1: ConvT2d 384->64 k9 s1 p0: 20x20 -> 28x28
        x = relu(ct("upsample1", poses, ranges, 64, 9, 1, 0, 0, nd=2))
        x = x.reshape(b, 1, h28, w28, 64)

        c28 = relu(conv("conv28", cross28, 832, 64, 3, nd=2)).reshape(
            b, 1, h28, w28, 64
        )
        x = jnp.concatenate([x, c28], axis=-1)  # (B, 1, 28, 28, 128)

        # upsample2/3: ConvT3d k3 s2 p1 op1 — exact 2x in each dim
        x = relu(ct("upsample2", x, 128, 64, 3, 2, 1, 1, nd=3))  # (B,2,56,56,64)
        c56 = relu(conv("conv56", cross56, 192, 64, 3, nd=3))
        x = jnp.concatenate([x, c56], axis=-1)

        x = relu(ct("upsample3", x, 128, 64, 3, 2, 1, 1, nd=3))  # (B,4,112,112,64)
        c112 = relu(conv("conv112", cross112, 64, 64, 3, nd=3))
        x = jnp.concatenate([x, c112], axis=-1)

        # ---- head: upsample4 -> Dropout3d -> smooth (ref :368-374,
        # :504-509).  The chain is affine, so by default it runs as ONE
        # fused op (ops/fused_head.py): exact same numerics, no
        # (B,8,224,224,128) intermediate, ~30x fewer FLOPs than the
        # naive ConvT pair.  fused_head=False keeps the literal chain
        # (the parity baseline the fusion is tested against).
        up4_k = self.param("upsample4_kernel", _normal(0.02), (3, 3, 3, 128, 128))
        up4_b = self.param(
            "upsample4_bias", _torch_conv_uniform(128 * 27), (128,)
        )
        sk = self.param("smooth_kernel", _normal(0.02), (3, 3, 3, 128, 1))
        sb = self.param("smooth_bias", _torch_conv_uniform(1 * 27), (1,))

        if self.fused_head:
            if train and self.dropout_rate > 0.0:
                keep = 1.0 - self.dropout_rate
                rng = self.make_rng("dropout")
                mask = jax.random.bernoulli(rng, p=keep, shape=(b, 128))
                drop_scale = mask.astype(jnp.float32) / keep
            else:
                drop_scale = jnp.ones((b, 128), jnp.float32)
            seg = fused_decoder_head(
                x.astype(dt), up4_k, up4_b, sk, sb, drop_scale
            )
        else:
            y = (
                conv_transpose_nd(x.astype(dt), up4_k.astype(dt), 2, 1, 1)
                + up4_b
            )  # (B,8,224,224,128)
            y = Dropout3d(self.dropout_rate, name="drop_dec")(
                y, deterministic=not train
            )
            seg = (
                conv_transpose_nd(y.astype(dt), sk.astype(dt), 1, 1, 0)[..., 0]
                + sb
            )

        seg_logits = seg.reshape(b, 8, H_in, W_in).astype(jnp.float32)
        return seg_logits, class_scores.astype(jnp.float32), feat
