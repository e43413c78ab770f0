"""Keras → flax pytree weight conversion for the backbone zoo.

The reference builds its backbones from ``tf.keras.applications`` with
pretrained ImageNet weights (semantic_segmentation.py:494-771).  This
converter imports those weights into this framework's param/batch-stats
pytrees — the numerical-parity linchpin (SURVEY §7 "hard parts").

It is name-driven: every backbone module here names its flax submodules
after the corresponding Keras layer, so the expected Keras layer name for a
flax param path is simply the path components joined with '_' (dropping the
trailing 'bn' wrapper level), e.g.:

    ('block_1', 'expand', 'kernel')        → Conv  'block_1_expand'
    ('bn_Conv1', 'bn', 'scale')            → BN    'bn_Conv1'
    ('block2_sepconv1', 'depthwise', ...)  → SeparableConv 'block2_sepconv1'

Layout transforms: Keras Conv2D kernels are already HWIO (= flax);
DepthwiseConv2D kernels (kh, kw, cin, mult) transpose to flax's grouped
layout (kh, kw, mult, cin); BN (gamma, beta, moving_mean, moving_var) →
(scale, bias) params + (mean, var) batch_stats.

Works with any weight source exposing the Keras layer API (an in-memory
model — including ``weights=None`` random models for parity tests — or one
loaded from an .h5 file).
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _as_f32(w):
    """Weights land as float32 — except float64 sources (the fp64
    trajectory-parity suite builds Keras under floatx float64), which are
    preserved so the transplanted model stays fp64 end-to-end."""
    a = np.asarray(w)
    return a if a.dtype == np.float64 else np.asarray(a, np.float32)


def _keras_layer_name(path: tuple[str, ...]) -> str:
    parts = list(path)
    if parts and parts[-1] == "bn":  # our BatchNorm wrapper level
        parts = parts[:-1]
    return "_".join(parts)


def _nasnet_layer_name(path: tuple[str, ...]) -> str | None:
    """NASNet flax-path → Keras layer name.

    Keras NASNet layers are named ``{inner}_{branch?}_{cell_id}`` where
    cell_id ∈ {stem_1, stem_2, 0.., reduce_N} (keras nasnet.py name
    scheme); our modules nest as cell/branch/inner:

        ('cell_0', 'normal_conv_1')                            → normal_conv_1_0
        ('cell_0', 'adjust', 'adjust_conv_projection')         → adjust_conv_projection_0
        ('reduce_4', 'reduction_left1', 'separable_conv_1_depthwise')
                                               → separable_conv_1_reduction_left1_reduce_4
        ('cell_0', 'normal_left1', 'separable_conv_1_bn', 'bn')
                                               → separable_conv_1_bn_normal_left1_0
    """
    head = path[0]
    if head.startswith("cell_"):
        cell_id = head[len("cell_") :]
    elif head.startswith(("stem_", "reduce_")):
        cell_id = head
    else:
        return None
    rest = [c for c in path[1:] if c != "adjust"]
    if rest and rest[-1] == "bn":
        rest = rest[:-1]
    if not rest:
        return None
    inner = rest[-1]
    for suffix in ("_depthwise", "_pointwise"):
        if inner.endswith(suffix):
            inner = inner[: -len(suffix)]
    branch = rest[0] if len(rest) > 1 else None
    return f"{inner}_{branch}_{cell_id}" if branch else f"{inner}_{cell_id}"


def _index_keras_weights(keras_model) -> dict[str, dict[str, np.ndarray]]:
    """layer name → {weight kind → array}.  Kind inferred from the weight's
    own name (kernel / depthwise_kernel / pointwise_kernel / bias / gamma /
    beta / moving_mean / moving_variance)."""
    out: dict[str, dict[str, np.ndarray]] = {}
    for layer in keras_model.layers:
        weights = layer.get_weights()
        if not weights:
            continue
        kinds = []
        for w in layer.weights:
            n = w.name.split("/")[-1].split(":")[0]
            kinds.append(n)
        d = {}
        for kind, val in zip(kinds, weights):
            d[kind] = np.asarray(val)
        # normalize '/' in layer names (TF2.4 DenseNet uses 'conv1/conv')
        out[layer.name.replace("/", "_")] = d

    # Canonicalize Keras auto-numbered layer names: the global counter
    # ('conv2d_7', 'batch_normalization_12', …) depends on how many models
    # were built in the process; remap to a per-model 0-based sequence
    # ('conv2d', 'conv2d_1', …) matching a fresh build — which is what the
    # flax modules are named after (e.g. Xception's shortcut convs).
    import re

    for prefix in ("conv2d", "batch_normalization", "separable_conv2d", "activation"):
        pat = re.compile(rf"^{prefix}(_\d+)?$")
        numbered = [n for n in out if pat.match(n)]
        if not numbered:
            continue
        numbered.sort(key=lambda n: int(n[len(prefix) + 1 :]) if len(n) > len(prefix) else -1)
        canonical = [prefix if i == 0 else f"{prefix}_{i}" for i in range(len(numbered))]
        if numbered != canonical:
            renamed = {c: out.pop(n) for n, c in zip(numbered, canonical)}
            out.update(renamed)
    return out


def convert_keras_backbone(keras_model, variables, base_path: str = "base"):
    """Return a copy of ``variables`` with the backbone subtree replaced by
    the Keras model's weights.

    variables: {'params': ..., 'batch_stats': ...} as produced by
    ``model.init`` (full DeepLab model or a bare backbone: ``base_path``
    selects the subtree; pass '' for a bare backbone's variables).
    """
    import jax

    kweights = _index_keras_weights(keras_model)
    used: set[str] = set()
    missing: list[str] = []

    def subtree(tree):
        return tree[base_path] if base_path else tree

    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    batch_stats = jax.tree_util.tree_map(lambda x: x, variables.get("batch_stats", {}))

    def walk(ptree, btree, path):
        if isinstance(ptree, dict) and ("kernel" in ptree or "scale" in ptree or "bias" in ptree or "mean" in ptree):
            name = _keras_layer_name(path)
            kw = kweights.get(name)
            if kw is None and path and path[-1] in ("depthwise", "pointwise"):
                # Keras SeparableConv2D is ONE layer holding both kernels
                # (e.g. Xception 'block2_sepconv1'); our module splits it.
                kw = kweights.get(_keras_layer_name(path[:-1]))
                name = _keras_layer_name(path[:-1])
            if kw is None:
                nn_name = _nasnet_layer_name(path)
                if nn_name is not None and nn_name in kweights:
                    kw = kweights[nn_name]
                    name = nn_name
            if kw is None:
                missing.append(name)
                return
            used.add(name)
            if "kernel" in ptree:
                want = ptree["kernel"].shape
                if path[-1].endswith("depthwise") and "depthwise_kernel" in kw:
                    k = kw["depthwise_kernel"].transpose(0, 1, 3, 2)
                elif path[-1].endswith("pointwise") and "pointwise_kernel" in kw:
                    k = kw["pointwise_kernel"]
                elif "kernel" in kw:
                    k = kw["kernel"]
                    if k.shape != want and k.ndim == 4 and k.transpose(0, 1, 3, 2).shape == tuple(want):
                        k = k.transpose(0, 1, 3, 2)  # grouped/depthwise conv
                else:
                    missing.append(f"{name}:kernel")
                    return
                assert k.shape == tuple(want), (name, k.shape, want)
                ptree["kernel"] = _as_f32(k)
                if "bias" in ptree and "bias" in kw:
                    ptree["bias"] = _as_f32(kw["bias"])
            else:  # BatchNorm
                if "scale" in ptree and "gamma" in kw:
                    ptree["scale"] = _as_f32(kw["gamma"])
                if "bias" in ptree and "beta" in kw:
                    ptree["bias"] = _as_f32(kw["beta"])
                if btree is not None:
                    if "mean" in btree and "moving_mean" in kw:
                        btree["mean"] = _as_f32(kw["moving_mean"])
                    if "var" in btree and "moving_variance" in kw:
                        btree["var"] = _as_f32(kw["moving_variance"])
            return
        if isinstance(ptree, dict):
            for k in ptree:
                walk(ptree[k], btree.get(k) if isinstance(btree, dict) else None, path + (k,))

    p_sub = subtree(params)
    b_sub = subtree(batch_stats) if batch_stats else {}
    walk(p_sub, b_sub, ())

    # EfficientNet's weight-carrying Normalization layer (stats stored as
    # root-level batch_stats leaves, see backbones/efficientnet.py).
    if isinstance(b_sub, dict) and "normalization_mean" in b_sub:
        kw = kweights.get("normalization")
        if kw is not None:
            if "mean" in kw:
                b_sub["normalization_mean"] = _as_f32(kw["mean"]).reshape(-1)
            if "variance" in kw:
                b_sub["normalization_var"] = _as_f32(kw["variance"]).reshape(-1)
            used.add("normalization")

    new_vars = dict(variables)
    new_vars["params"] = params
    new_vars["batch_stats"] = batch_stats
    return new_vars, {"missing": missing, "used": sorted(used)}


def load_keras_h5_backbone(h5_path: str, builder, variables, base_path: str = "base"):
    """Convert from a saved Keras .h5/.keras file: ``builder()`` must
    reconstruct the matching Keras architecture, then weights are loaded
    and converted."""
    model = builder()
    model.load_weights(h5_path)
    return convert_keras_backbone(model, variables, base_path)
