"""BYOL engine: online/target towers, EMA momentum update, pretext heads.

Functional reimplementation of the reference BYOL wrappers
(``models/pace/r21d_byol.py:260-401``, ``models/coclr/s3dg.py:336-538``,
``models/pace/c3d_byol.py:138-262``, ``models/BE/r3d_byol.py:237-432``,
``models/BE/i3d_byol.py:616-799``) generalized over a
:class:`~cstp_tpu.models.BackboneSpec`:

* ``CSTPPretrain`` — one Flax module holding online_net, target_net,
  predictor, and the four pretext heads. Its ``__call__`` is the reference
  ``forward(o_type='loss_com')``: two online passes, predictor, two
  stop-gradient target passes, BYOL regression loss, six pretext logits.
  Families WITH a projector (r21d, s3d) regress predictor(projection)
  against the target projection; families WITHOUT one (c3d, r3d, i3d)
  regress predictor(feature) against the target feature.
* ``ema_update`` — the momentum update of the target tower
  (r21d_byol.py:331-340), called by the train step BEFORE the forward pass
  (the reference updates inside forward, pre-target-encode). torch's
  ``parameters()`` excludes BN running stats, so EMA touches only params.
* ``CSTPClassify`` — finetune/test variant: backbone feature ->
  L2-normalize -> BN -> linear classifier (r21d_byol.py:394-399).

Gradient flow matches the reference: target outputs are stop-gradient'ed and
the optimizer is masked off the ``target_net`` subtree (reference target
params have requires_grad=False — no grads, no weight decay).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from cstp_tpu.models import backbone_spec, make_backbone
from cstp_tpu.models.layers import (
    BatchNorm,
    MLPHead,
    PretextHead,
    l2_normalize,
    torch_linear_bias_init,
)


def byol_regression_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """2 - 2*cos(x, y), per sample (reference `_loss_fn`, r21d_byol.py:346-349)."""
    x = l2_normalize(x.astype(jnp.float32))
    y = l2_normalize(y.astype(jnp.float32))
    return 2.0 - 2.0 * jnp.sum(x * y, axis=-1)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  reduce: bool = True) -> jnp.ndarray:
    """Softmax cross entropy with integer labels (torch CrossEntropyLoss).
    ``reduce=False`` returns the per-sample (B,) losses (used by the
    mask-weighted val aggregation)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    per = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(per) if reduce else per


def ema_update(target_params, online_params, momentum: float):
    """target <- m * target + (1 - m) * online (r21d_byol.py:335-337)."""
    return jax.tree_util.tree_map(
        lambda t, o: t * momentum + o.astype(t.dtype) * (1.0 - momentum),
        target_params,
        online_params,
    )


def _feat_and_proj(out, spec):
    """Normalize backbone output to (feat, byol_embedding)."""
    if isinstance(out, tuple):
        feat, proj = out
    else:
        feat = proj = out
    if spec.l2_feat:  # i3d id_head L2-normalizes (i3d_byol.py:328-341)
        feat = l2_normalize(feat)
        proj = feat if not isinstance(out, tuple) else proj
    return feat, proj


class CSTPPretrain(nn.Module):
    """Pretraining model: BYOL towers + 4 pretext heads (spec-driven)."""

    backbone: str = "r21d"
    depth: int = 1
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1            # >1 = per-replica BN stats (--sync_bn 0)
    shortcut: str = "B"           # ResNet3D A/B (--resnet_shortcut/--sc_type)
    s2d_stem: bool = False        # s3d space-to-depth stem (--s2d_stem)
    remat: bool = False           # remat residual stages (--remat; r21d only)
    remat_policy: str = ""        # 'bnrelu' selective remat (--remat_policy)
    alpha: int = 4                # slowfast frame-rate ratio (--alpha)
    fused_conv: int = 0           # Pallas-fused (2+1)D blocks (--fused_conv:
                                  # 1 = both towers, 2 = EMA target tower only)
    mid_round: int = 1            # lane-rounded r21d mid widths (--mid_round)
    t_fold: bool = False          # T-folded spatial convs (--t_fold)
    quant: str = ""               # '' | 'int8' quantized fwd convs (--quant)
    quant_scope: str = "all"      # 'all' | 'target' (--quant_scope: 'target'
                                  # = EMA tower only — forward-only, so the
                                  # bf16 activation copies are dead and int8
                                  # replaces rather than duplicates storage)
    # True: the two views run through each tower as ONE batched 2B call with
    # BN groups DOUBLED so statistics stay per-view. False: two B-sized calls
    # per tower — the reference's own call pattern (r21d_byol.py:358-372).
    # Both are numerically per-view; which is faster is hardware-dependent
    # (grouped BN stats defeat XLA's conv+BN-stat epilogue fusion; the 2B
    # call halves dispatches and doubles conv M — see PERF.md round 3).
    concat_views: bool = True

    def setup(self):
        spec = backbone_spec(self.backbone, self.depth)
        self.spec = spec
        use_proj = spec.proj_dim is not None
        g2 = 2 * self.bn_groups if self.concat_views else self.bn_groups
        extra = ({"alpha": self.alpha}
                 if self.backbone.startswith("slowfast") else {})
        if self.mid_round > 1 and self.backbone.startswith("r21d"):
            extra["mid_round"] = self.mid_round
        if self.t_fold and self.backbone.startswith("r21d"):
            extra["t_fold"] = True
        if self.remat_policy and self.backbone.startswith("r21d"):
            extra["remat_policy"] = self.remat_policy
        # --fused_conv (r21d): 1 = Pallas-fused (2+1)D blocks in BOTH towers
        # (the fused backward is an XLA recompute, so the online tower pays
        # it); 2 = TARGET tower only — the EMA tower is forward-only (its
        # params are stop-gradient), so mode 2 banks the kernel's forward
        # win without ever invoking the recompute VJP.
        fc = int(self.fused_conv)
        extra_online = dict(extra)
        extra_target = dict(extra)
        if self.backbone.startswith("r21d"):
            if fc == 1:
                extra_online["fused_conv"] = True
            if fc >= 1:
                extra_target["fused_conv"] = True
        if self.quant:
            # --quant int8/int8_fixed thread into EVERY family's towers
            # (int8_store stays r21d-only — rejected up front by
            # train/pretrain.py _check_trainable_quant); slowfast gained
            # conv-site plumbing in round 5 (models/slowfast.py _conv)
            extra_target["quant"] = self.quant
            if self.quant_scope == "all":
                extra_online["quant"] = self.quant
        self.online_net = make_backbone(
            self.backbone, self.depth, dtype=self.dtype, proj_flag=use_proj,
            bn_groups=g2, shortcut=self.shortcut, s2d_stem=self.s2d_stem,
            remat=self.remat, name="online_net", **extra_online,
        )
        self.target_net = make_backbone(
            self.backbone, self.depth, dtype=self.dtype, proj_flag=use_proj,
            bn_groups=g2, shortcut=self.shortcut, s2d_stem=self.s2d_stem,
            remat=self.remat, name="target_net", **extra_target,
        )
        self.predictor = MLPHead(spec.pred_hidden, spec.pred_dim,
                                 dtype=self.dtype, bn_groups=g2, name="predictor")
        f = spec.feat_dim
        self.overlap_spa = PretextHead(spec.head_style, 2 * f, spec.n_spa,
                                       dtype=self.dtype, bn_groups=self.bn_groups, name="overlap_spa")
        self.overlap_tem = PretextHead(spec.head_style, 2 * f, spec.n_tem,
                                       dtype=self.dtype, bn_groups=self.bn_groups, name="overlap_tem")
        self.pb_cls = PretextHead(spec.head_style, f, spec.n_pb,
                                  dtype=self.dtype, bn_groups=g2, name="pb_cls")
        self.rotate_cls = PretextHead(spec.head_style, f, spec.n_rot,
                                      dtype=self.dtype, bn_groups=g2, name="rotate_cls")

    def __call__(self, x1, x2, train: bool = True, with_proj: bool = False):
        """o_type='loss_com' forward (r21d_byol.py:358-382).

        Returns (byol_loss_mean, (pred_spa, pred_tem, pb1, pb2, rot1, rot2)).
        With ``with_proj=True`` additionally returns the two online
        projections — input to the optional cross-replica NT-Xent term
        (``--loss_weight`` extension; ssl/ntxent.py).
        """
        spec = self.spec
        if self.concat_views:
            x12 = jnp.concatenate([x1, x2], axis=0)  # (2B, ...) one tower call
            feats, embs = _feat_and_proj(self.online_net(x12, train), spec)
            preds = self.predictor(embs, train)
            pred1, pred2 = jnp.split(preds, 2, axis=0)
            feat1, feat2 = jnp.split(feats, 2, axis=0)

            tout = self.target_net(x12, train)
            _, tembs = _feat_and_proj(tout, spec)
            temb1, temb2 = jnp.split(jax.lax.stop_gradient(tembs), 2, axis=0)
        else:
            # reference call pattern: one forward per view per tower
            # (r21d_byol.py:358-372); running stats update sequentially
            feat1, emb1 = _feat_and_proj(self.online_net(x1, train), spec)
            feat2, emb2 = _feat_and_proj(self.online_net(x2, train), spec)
            pred1 = self.predictor(emb1, train)
            pred2 = self.predictor(emb2, train)
            _, temb1 = _feat_and_proj(self.target_net(x1, train), spec)
            _, temb2 = _feat_and_proj(self.target_net(x2, train), spec)
            temb1 = jax.lax.stop_gradient(temb1)
            temb2 = jax.lax.stop_gradient(temb2)
            feats = jnp.concatenate([feat1, feat2], axis=0)
            embs = jnp.concatenate([emb1, emb2], axis=0)

        loss = byol_regression_loss(pred1, temb2) + byol_regression_loss(
            pred2, temb1
        )

        feat_cat = jnp.concatenate([feat1, feat2], axis=-1)
        if self.concat_views:
            pbs = self.pb_cls(feats, train)
            rots = self.rotate_cls(feats, train)
            pb1, pb2 = jnp.split(pbs, 2, axis=0)
            rot1, rot2 = jnp.split(rots, 2, axis=0)
        else:
            pb1 = self.pb_cls(feat1, train)
            pb2 = self.pb_cls(feat2, train)
            rot1 = self.rotate_cls(feat1, train)
            rot2 = self.rotate_cls(feat2, train)
        out = (
            self.overlap_spa(feat_cat, train),
            self.overlap_tem(feat_cat, train),
            pb1,
            pb2,
            rot1,
            rot2,
        )
        if with_proj:
            emb1, emb2 = jnp.split(embs, 2, axis=0)
            return jnp.mean(loss), out, (emb1, emb2)
        return jnp.mean(loss), out

    def embed(self, x, train: bool = False):
        """Online-tower features (for probing/eval)."""
        feat, _ = _feat_and_proj(self.online_net(x, train), self.spec)
        return feat


class CSTPClassify(nn.Module):
    """Finetune/test model (reference pretrain=False branch,
    r21d_byol.py:293-299, forward 394-399).

    ``head_style``:
      * 'linear' (default) — the BYOL-family finetune head: L2-normalize ->
        BN -> Linear (r21d_byol.py:394-399); ``cls_bn=False`` drops the BN.
      * 'mlp' — the standalone S3DClassify head: Linear -> BN -> ReLU ->
        Linear on raw features, no L2-norm (coclr/s3dg.py:279-335,
        model_name 's3d_classify' at models/model.py:50-53).
      * 'pace_project' — the LEGACY pace model reachable as bare
        ``--model_name r21d`` (models/model.py:41-43 ->
        pace/r21d.py R2Plus1DNet(linear_flag='project')): a 512-d Projector
        (Linear -> BN -> ReLU -> Linear -> BN -> ReLU, pace/r21d.py:243-257)
        whose OUTPUT is fed to cross-entropy as if it were logits — the
        reference's degenerate-but-live behavior, rebuilt faithfully behind
        ``--legacy_pace`` (num_classes must be <= 512).
    """

    backbone: str = "r21d"
    depth: int = 1
    num_classes: int = 101
    cls_bn: bool = True
    head_style: str = "linear"
    dtype: Any = jnp.bfloat16
    bn_groups: int = 1
    shortcut: str = "B"
    s2d_stem: bool = False
    alpha: int = 4                # slowfast frame-rate ratio (--alpha)
    fused_conv: bool = False      # Pallas-fused (2+1)D blocks (--fused_conv)
    mid_round: int = 1            # lane-rounded r21d mid widths (--mid_round)
    t_fold: bool = False          # T-folded spatial convs (--t_fold)
    quant: str = ""               # '' | 'int8' quantized fwd convs (--quant)

    def setup(self):
        spec = backbone_spec(self.backbone, self.depth)
        self.spec = spec
        extra = ({"alpha": self.alpha}
                 if self.backbone.startswith("slowfast") else {})
        if self.fused_conv and self.backbone.startswith("r21d"):
            extra["fused_conv"] = True
        if self.mid_round > 1 and self.backbone.startswith("r21d"):
            extra["mid_round"] = self.mid_round
        if self.t_fold and self.backbone.startswith("r21d"):
            extra["t_fold"] = True
        if self.quant:
            # int8 modes are threaded through every registered backbone:
            # r21d/c3d/r3d/s3d/i3d since round 4, slowfast (both pathways +
            # laterals) since round 5 (models/slowfast.py _conv)
            extra["quant"] = self.quant
        if self.head_style == "i3d_conv":
            # the faithful reference i3d classifier lives INSIDE the
            # backbone (I3D conv_head; i3d_byol.py:295-306) — no external
            # classify/cls_bn modules
            assert self.backbone.startswith("i3d"), self.backbone
            extra["conv_head"] = True
            extra["num_classes"] = self.num_classes
        self.online_net = make_backbone(
            self.backbone, self.depth, dtype=self.dtype, proj_flag=False,
            bn_groups=self.bn_groups, shortcut=self.shortcut,
            s2d_stem=self.s2d_stem,
            name="online_net", **extra,
        )
        if self.head_style == "i3d_conv":
            return
        if self.head_style == "mlp":
            self.classify = MLPHead(spec.feat_dim, self.num_classes,
                                    dtype=self.dtype,
                                    bn_groups=self.bn_groups, name="classify")
            return
        if self.head_style == "pace_project":
            self.classify = MLPHead(4096, 512, dtype=self.dtype,
                                    bn_groups=self.bn_groups, name="classify")
            self.pace_bn = BatchNorm(dtype=self.dtype, groups=self.bn_groups,
                                     name="pace_bn")
            return
        if self.cls_bn:
            self.cls_bn_mod = BatchNorm(dtype=self.dtype,
                                        groups=self.bn_groups, name="cls_bn")
        self.classify = nn.Dense(
            self.num_classes,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.glorot_uniform(),
            bias_init=torch_linear_bias_init(spec.feat_dim),
            name="classify",
        )

    def features(self, x, train: bool = False):
        """Backbone feature vector (pre-head), for nearest-neighbor video
        retrieval (``apply(..., method=CSTPClassify.features)``). The
        internal-head i3d variant has no pre-head feature to expose."""
        assert self.head_style != "i3d_conv", \
            "retrieval features need a pre-head backbone output"
        feat, _ = _feat_and_proj(self.online_net(x, train), self.spec)
        return feat.astype(jnp.float32)

    def __call__(self, x, train: bool = True):
        if self.head_style == "i3d_conv":
            return self.online_net(x, train)  # logits from the internal head
        feat, _ = _feat_and_proj(self.online_net(x, train), self.spec)
        if self.head_style == "mlp":
            return self.classify(feat, train).astype(jnp.float32)
        if self.head_style == "pace_project":
            p = self.classify(feat, train)
            return nn.relu(self.pace_bn(p, not train)).astype(jnp.float32)
        feat = l2_normalize(feat)
        if self.cls_bn:
            feat = self.cls_bn_mod(feat, not train)
        return self.classify(feat.astype(jnp.float32))
