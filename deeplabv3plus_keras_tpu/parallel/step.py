"""pjit'd train / eval / predict steps over a device mesh.

Replaces the reference's Keras ``model.fit``/``model.predict`` execution
layer (semantic_segmentation.py:1000-1009, :1080-1087) with explicitly
jit-compiled SPMD step functions: params/opt-state replicated, batch
sharded over the 'data' mesh axis (optionally height over 'space'), the
gradient all-reduce emitted by GSPMD as a psum over ICI.

Loss = class_balanced_loss (+ the Keras-style L2 of '_l2'-tagged kernels —
included in both train and val loss, as Keras adds regularizer losses to
both).  Metrics: per-batch confusion matrix, accumulated on host into the
streaming mIoU (reference compiles MeanIoUExt as a fit metric :785-787).

Batches are dicts with keys ``image`` (B,S,S,3), ``label`` (B,S,S,C) and
``valid`` (B,) — the 0/1 validity mask is the static-shape replacement for
the reference's ragged last batch (:1521-1560): padded samples contribute
zero to the confusion matrix (loss parity for full batches; padded tail
batches occur only at epoch boundaries).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..config import Config
from ..train.loss import (
    SS_NW,
    SS_PW,
    class_balanced_loss,
    class_balanced_loss_sparse,
    l2_penalty,
)
from ..ops.augment import augment_batch, parse_augment_conf
from ..ops.parity_tail import tail_loss_cm
from ..train.metrics import confusion_matrix_update, confusion_matrix_update_sparse
from ..train.optimizer import make_optimizer
from . import mesh as mesh_lib


def _use_fused_tail(conf: Config) -> bool:
    """Parity-decomposed tail (ops/parity_tail) applies when the decoder's
    final upsample is ×2 — i.e. under boundary refinement (reference
    :899-902: os/8 for os=16, os/4 for os=8 — both ×2).

    Extra config key 'fused_tail', DEFAULT OFF: measured on the v5e, the
    decomposition is ~11 ms/step SLOWER than XLA's conv-lowered resize at
    the flagship batch-16 shape (fp32 100.4 vs 89.4 ms) — each parity
    plane feeds several consumers (softmax reductions, loss, argmax), so
    XLA materializes all four planes plus the row-lerp intermediates,
    exceeding the single full-res materialization it replaces.  Kept as a
    tested option because it changes the memory SHAPE of the tail (peak
    activation residency drops by the full-res probs tensor), which can
    matter at image sizes where that tensor dominates HBM headroom."""
    return bool(conf.extra.get("fused_tail", False)) and conf.nn_arch.boundary_refinement


def default_class_weights(num_classes: int):
    """The reference trains with the hard-coded 21-class VOC-Aug weights
    (semantic_segmentation.py:785-787); ``ClassBalancedLoss`` defaults to
    pw=1, nw=0 (plain CE) otherwise (:425-426)."""
    if num_classes == len(SS_PW):
        return SS_PW, SS_NW
    return np.ones(num_classes, np.float32), np.zeros(num_classes, np.float32)


def resolve_class_weights(conf: Config):
    """Class-balance weights for this config: the extra key
    ``class_weights_npz`` (an .npz with ``pw``/``nw`` arrays, e.g. from
    tools/compute_class_weights.py) overrides the defaults — the offline
    route the reference used to produce its hard-coded table
    (cal_ss_class_imbalance_weights, :365-407).  Returns None to mean
    "use default_class_weights"."""
    path = conf.extra.get("class_weights_npz")
    if not path:
        return None
    z = np.load(path)
    pw = np.asarray(z["pw"], np.float32)
    nw = np.asarray(z["nw"], np.float32)
    n = conf.nn_arch.num_classes
    if pw.shape != (n,) or nw.shape != (n,):
        raise ValueError(
            f"class_weights_npz arrays must have shape ({n},); "
            f"got pw {pw.shape}, nw {nw.shape}"
        )
    return pw, nw


def _loss_for(label, probs, pw, nw, valid):
    """Dispatch on label layout: one-hot (B,H,W,C) — the reference Sequence
    contract (:1746) — or integer (B,H,W), which skips the one-hot tensor
    entirely (identical numerics; see train/loss.py)."""
    if label.ndim == probs.ndim:
        return class_balanced_loss(label, probs, pw, nw, valid=valid)
    return class_balanced_loss_sparse(label, probs, pw, nw, valid=valid)


def _cm_for(label, probs, num_classes, valid):
    if label.ndim == probs.ndim:
        return confusion_matrix_update(label, probs, num_classes, valid)
    return confusion_matrix_update_sparse(label, probs, num_classes, valid)


def _variables(state, quant=None):
    """Inference variables; a calibrated ``quant`` collection (ops/quant.py)
    switches eligible convs to the int8 MXU path — baked into the jitted
    step as constants (a handful of scalars), so no pytree/sharding changes."""
    v = {"params": state.params, "batch_stats": state.batch_stats}
    if quant:
        v["quant"] = quant
    return v


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(conf: Config, variables, tx=None):
    tx = tx or make_optimizer(conf.hps)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    return state, tx


def build_train_step(model, tx, conf: Config, class_weights=None) -> Callable:
    wd = conf.hps.weight_decay
    num_classes = conf.nn_arch.num_classes
    pw, nw = class_weights or default_class_weights(num_classes)
    accum = max(1, int(conf.extra.get("grad_accum", 1)))
    # extra key 'augment' (default off = reference trajectory untouched):
    # on-device random flip / scale-crop fused into this step's jit
    # (ops/augment.py) — the standard DeepLab training recipe the
    # reference lacks.
    aug = parse_augment_conf(conf.extra.get("augment"))

    fused_tail = _use_fused_tail(conf)

    def maybe_augment(batch, step_rng):
        """(possibly augmented batch, dropout rng) for this step."""
        if aug is None:
            return batch, step_rng
        aug_rng, drop_rng = jax.random.split(step_rng)
        image, label = augment_batch(
            batch["image"], batch["label"], aug_rng, flip=aug[0], scale_range=aug[1]
        )
        return dict(batch, image=image, label=label), drop_rng

    def grads_one(params, batch_stats, batch, drop_rng):
        """loss+l2 value, grads, new batch_stats and cm for one (micro)batch."""

        if fused_tail:
            # parity-decomposed tail: the model stops at the half-res
            # logits; upsample+softmax+loss+CM never touch a full-res
            # tensor (ops/parity_tail.py)
            def loss_fn(p):
                (logits, up), mutated = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    batch["image"],
                    train=True,
                    rngs={"dropout": drop_rng},
                    mutable=["batch_stats"],
                    return_presample=True,
                )
                assert up == 2, "fused tail requires the x2 refinement tail"
                loss, cm = tail_loss_cm(
                    logits, batch["label"], pw, nw, num_classes, batch["valid"]
                )
                loss = loss + l2_penalty(p, wd)
                return loss, (cm, mutated["batch_stats"])

            (loss, (cm, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            return loss, grads, new_bs, cm

        def loss_fn(p):
            probs, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                batch["image"],
                train=True,
                rngs={"dropout": drop_rng},
                mutable=["batch_stats"],
            )
            loss = _loss_for(batch["label"], probs, pw, nw, batch["valid"])
            loss = loss + l2_penalty(p, wd)
            return loss, (probs, mutated["batch_stats"])

        (loss, (probs, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        cm = _cm_for(batch["label"], probs, num_classes, batch["valid"])
        return loss, grads, new_bs, cm

    def apply_update(state, loss, grads, new_bs, cm):
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
        )
        return new_state, {"loss": loss, "cm": cm}

    def train_step(state: TrainState, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        batch, drop_rng = maybe_augment(batch, step_rng)
        return apply_update(
            state, *grads_one(state.params, state.batch_stats, batch, drop_rng)
        )

    if accum == 1:
        return train_step

    def train_step_accum(state: TrainState, batch, rng):
        """Gradient accumulation (extra key 'grad_accum': N): the batch is
        split into N sequential microbatches via lax.scan; gradients and
        loss are averaged, confusion matrices summed, BN running stats
        threaded through the scan (standard accumulation semantics: BN
        sees microbatch statistics), then ONE optimizer update is applied.
        Lets memory-limited chips train the reference's effective batch.
        """
        step_rng = jax.random.fold_in(rng, state.step)
        batch, step_rng = maybe_augment(batch, step_rng)
        B = batch["image"].shape[0]
        if B % accum:
            raise ValueError(f"grad_accum {accum} must divide batch size {B}")
        micro = jax.tree.map(
            lambda x: x.reshape((accum, B // accum) + x.shape[1:]), batch
        )

        def body(carry, xs):
            bs, gsum, lsum, cmsum = carry
            mbatch, idx = xs
            loss, grads, new_bs, cm = grads_one(
                state.params, bs, mbatch, jax.random.fold_in(step_rng, idx)
            )
            gsum = jax.tree.map(jnp.add, gsum, grads)
            return (new_bs, gsum, lsum + loss, cmsum + cm), None

        init = (
            state.batch_stats,
            jax.tree.map(jnp.zeros_like, state.params),
            jnp.zeros((), jnp.float32),
            jnp.zeros((num_classes, num_classes), jnp.int32),
        )
        (new_bs, gsum, lsum, cmsum), _ = jax.lax.scan(
            body, init, (micro, jnp.arange(accum))
        )
        grads = jax.tree.map(lambda g: g / accum, gsum)
        return apply_update(state, lsum / accum, grads, new_bs, cmsum)

    return train_step_accum


def _tta_probs_fn(model, conf: Config, scales, flip: bool) -> Callable:
    """Multi-scale + horizontal-flip test-time augmentation (beyond-parity;
    the standard DeepLab evaluation protocol — the reference evaluates at a
    single scale, semantic_segmentation.py:1080-1087).

    Each scaled size is rounded to a multiple of ``output_stride`` so the
    decoder's exact ×os upsample lands back on the scaled size; per-variant
    probabilities are bilinearly resized to the native size and averaged.
    All variants run inside the ONE jitted eval step (each scale is its own
    static shape at trace time)."""
    os_ = conf.nn_arch.output_stride
    scales = tuple(float(s) for s in (scales or (1.0,)))

    def tta_probs(variables, images):
        B, S, C_in = images.shape[0], images.shape[1], images.shape[-1]
        acc, n = 0.0, 0
        for s in scales:
            sz = max(os_, int(round(S * s / os_)) * os_)
            x = (
                images
                if sz == S
                else jax.image.resize(images, (B, sz, sz, C_in), "linear")
            )
            variants = [x, x[:, :, ::-1]] if flip else [x]
            for i, xv in enumerate(variants):
                p = model.apply(variables, xv, train=False)
                if i == 1:
                    p = p[:, :, ::-1]  # un-flip the prediction
                if sz != S:
                    p = jax.image.resize(p, (B, S, S, p.shape[-1]), "linear")
                acc = acc + p
                n += 1
        return acc / n

    return tta_probs


def build_eval_step(
    model,
    conf: Config,
    class_weights=None,
    with_probs: bool = True,
    tta_scales=None,
    tta_flip: bool = False,
    quant=None,
) -> Callable:
    """``with_probs=False`` drops the (B, S, S, C) probability tensor from
    the outputs — on a multi-chip mesh out_shardings=repl would all-gather
    and replicate ~176 MB per 16×512² batch that the validation loop never
    reads (probs are only consumed by evaluate(result_saving=True)).
    Single-chip step time is unchanged (measured 79 ms both ways); the
    saving is the collective and the HBM residency.

    ``tta_scales``/``tta_flip`` (extra config keys ``eval_scales`` /
    ``eval_flip``) enable multi-scale + flip test-time augmentation — see
    ``_tta_probs_fn``."""
    wd = conf.hps.weight_decay
    num_classes = conf.nn_arch.num_classes
    pw, nw = class_weights or default_class_weights(num_classes)
    tta = bool(tta_scales) or tta_flip

    if tta:
        probs_fn = _tta_probs_fn(model, conf, tta_scales, tta_flip)

        def eval_step_tta(state: TrainState, batch):
            probs = probs_fn(_variables(state, quant), batch["image"])
            loss = _loss_for(batch["label"], probs, pw, nw, batch["valid"])
            loss = loss + l2_penalty(state.params, wd)
            cm = _cm_for(batch["label"], probs, num_classes, batch["valid"])
            out = {"loss": loss, "cm": cm}
            if with_probs:
                out["probs"] = probs
            return out

        return eval_step_tta

    if _use_fused_tail(conf) and not with_probs:
        # probs-free validation: same parity-decomposed tail as training
        def eval_step_fused(state: TrainState, batch):
            logits, up = model.apply(
                _variables(state, quant),
                batch["image"],
                train=False,
                return_presample=True,
            )
            assert up == 2
            loss, cm = tail_loss_cm(
                logits, batch["label"], pw, nw, num_classes, batch["valid"]
            )
            return {"loss": loss + l2_penalty(state.params, wd), "cm": cm}

        return eval_step_fused

    def eval_step(state: TrainState, batch):
        probs = model.apply(
            _variables(state, quant),
            batch["image"],
            train=False,
        )
        loss = _loss_for(batch["label"], probs, pw, nw, batch["valid"])
        loss = loss + l2_penalty(state.params, wd)
        cm = _cm_for(batch["label"], probs, num_classes, batch["valid"])
        out = {"loss": loss, "cm": cm}
        if with_probs:
            out["probs"] = probs
        return out

    return eval_step


def build_predict_step(model, quant=None) -> Callable:
    def predict_step(state: TrainState, images):
        return model.apply(_variables(state, quant), images, train=False)

    return predict_step


def build_label_step(model, use_pallas: bool = True, quant=None) -> Callable:
    """Class-index prediction entirely on device.

    argmax∘softmax∘upsample ≡ argmax∘upsample, so labels are computed from
    the decoder's *pre-upsample* logits through the fused Pallas
    upsample+argmax kernel (kernels/upsample_argmax) — the (B, S, S, C)
    probability tensor never exists, on device or host.  The reference's
    test loop pulled full probs through ``model.predict`` and argmaxed on
    host (semantic_segmentation.py:1169-1181).
    """
    from ..kernels import upsample_argmax

    def label_step(state: TrainState, images):
        variables = _variables(state, quant)
        if use_pallas:
            logits, up = model.apply(
                variables, images, train=False, return_presample=True
            )
            return upsample_argmax(logits, up)
        probs = model.apply(variables, images, train=False)
        return jnp.argmax(probs, axis=-1).astype(jnp.int32)

    return label_step


def shard_step(step_fn, mesh, *, kind: str, spatial: bool = False):
    """jit a step function with explicit shardings over ``mesh``.

    kind: 'train' (state, batch, rng) → (state, metrics);
          'eval'  (state, batch) → metrics;
          'predict' (state, images) → probs.

    The jitted function is created once (stable cache); batches must carry
    exactly the keys image/label/valid.
    """
    # The Pallas depthwise stencil is a plain custom call that GSPMD cannot
    # partition; any step sharded over a non-trivial mesh must use XLA's
    # conv lowering (which inserts the halo exchanges itself).  api.py sets
    # this too, but the guard belongs at the parallel layer so direct users
    # of shard_step (tools, __graft_entry__.dryrun_multichip) are covered.
    from ..kernels import set_single_device_mesh

    set_single_device_mesh(mesh.size == 1)
    repl = mesh_lib.replicated(mesh)
    bsh = mesh_lib.batch_sharding(mesh, spatial)
    ssh = mesh_lib.sample_sharding(mesh)
    batch_shardings = {"image": bsh, "label": bsh, "valid": ssh}

    if kind == "train":
        return jax.jit(
            step_fn,
            in_shardings=(repl, batch_shardings, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )
    if kind == "eval":
        return jax.jit(
            step_fn, in_shardings=(repl, batch_shardings), out_shardings=repl
        )
    if kind in ("predict", "label"):
        return jax.jit(step_fn, in_shardings=(repl, bsh), out_shardings=repl)
    raise ValueError(kind)
