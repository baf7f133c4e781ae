"""Graph convolution over dense chart-atlas adjacencies.

The GCN family shared by the vision deformation model, the mesh autoencoder
and the graph policy network (reference ``reconstruction/vision/model.py:
290-363``, duplicated at ``autoencoder/model.py:96-124`` and
``policies/DDQN/model.py:132-160`` — here it exists once).

TPU notes: the adjacency is a dense (V, V) row-stochastic matrix (V ≈ 2k),
so neighborhood aggregation is a single MXU matmul per layer — XLA fuses the
feature matmul, the aggregation, the bias add, and the ReLU.  The "cut"
trick (only the first ``cut`` fraction of features is aggregated over the
graph; the rest bypass per-vertex) is expressed with static slices so the
compiler sees fixed shapes.
"""

from __future__ import annotations

from collections.abc import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


def gcn_uniform_init(scale_rows: int):
    """The reference's custom GCN weight init: uniform(-s, s) with
    s = 0.3 * 6 / sqrt(in_features + leading_dim) where leading_dim is the
    broadcast dim of the torch parameter (always 1)
    (``vision/model.py:345-349``)."""

    def init(key, shape, dtype=jnp.float32):
        import jax

        stdv = 0.3 * 6.0 / (shape[0] + scale_rows) ** 0.5
        return jax.random.uniform(key, shape, dtype, -stdv, stdv)

    return init


def bias_uniform_init(key, shape, dtype=jnp.float32):
    import jax

    return jax.random.uniform(key, shape, dtype, -0.1, 0.1)


def _mxu_matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Matmul with bf16 operands and f32 accumulation (TPU only).

    The MXU natively multiplies bf16 at ~2x the f32 issue rate while
    accumulating in f32, and casting the operands halves the HBM traffic
    for the dense (V, V) adjacency read — the GCN stack's real cost.
    Params, biases, and every op outside the two big matmuls stay f32,
    so this is standard mixed precision (not a model dtype change); eval
    CD on an f32-trained checkpoint moves <0.1%.  On CPU (tests, the
    virtual-mesh dryrun) bf16 is emulated and slower, so keep f32 there —
    the backend is a trace-time constant, so this is jit-safe."""
    if jax.default_backend() == "cpu":
        return jnp.matmul(a, b)
    return jnp.matmul(
        a.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


class GCNLayer(nn.Module):
    """One graph-convolution layer with the partial-aggregation "cut"."""

    out_features: int
    cut: float = 0.33
    do_cut: bool = True

    @nn.compact
    def __call__(self, features: jnp.ndarray, adj: jnp.ndarray) -> jnp.ndarray:
        in_features = features.shape[-1]
        weight = self.param(
            "weight", gcn_uniform_init(1), (in_features, self.out_features)
        )
        bias = self.param("bias", bias_uniform_init, (self.out_features,))
        feats = _mxu_matmul(features, weight)  # (B, V, out)
        if self.do_cut:
            length = round(self.out_features * self.cut)
            shared = _mxu_matmul(adj, feats[..., :length]) + bias[:length]
            # quirk preserved from the reference: bias is only added to the
            # aggregated slice in cut layers (vision/model.py:354-358)
            return jnp.concatenate([shared, feats[..., length:]], axis=-1)
        return _mxu_matmul(adj, feats) + bias


class GCN(nn.Module):
    """Stack of GCNLayers: hidden layers ReLU + cut, final layer linear.

    ``debug_nan`` installs the reference's per-layer NaN tripwire
    (``vision/model.py:326-329``) as a ``jax.debug.print`` — jit-safe, only
    fires when a layer's activations go non-finite.  Enable with
    ``A3VT_DEBUG_NAN=1`` (checked at trace time)."""

    num_layers: int
    hidden_size: int
    out_size: int = 3
    cut: float = 0.33

    @nn.compact
    def __call__(self, features: jnp.ndarray, adj: jnp.ndarray) -> jnp.ndarray:
        import os

        debug_nan = bool(os.environ.get("A3VT_DEBUG_NAN"))
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            features = GCNLayer(
                out_features=self.out_size if last else self.hidden_size,
                cut=self.cut,
                do_cut=not last,
            )(features, adj)
            if debug_nan:
                bad = jnp.sum(~jnp.isfinite(features))
                jax.lax.cond(
                    bad > 0,
                    lambda b=bad, i=i: jax.debug.print(
                        "GCN layer {i}/{n}: {b} non-finite activations",
                        i=i, n=self.num_layers, b=b, ordered=False,
                    ),
                    lambda: None,
                )
            if not last:
                features = nn.relu(features)
        return features


class PositionalEncoder(nn.Module):
    """NeRF-embed vertex positions then lift to ``out_size`` with an MLP
    (reference ``vision/model.py:367-399``)."""

    out_size: int

    @nn.compact
    def __call__(self, positions: jnp.ndarray) -> jnp.ndarray:
        from active_3d_vision_and_touch_tpu.ops.encoding import nerf_embedding

        x = nerf_embedding(positions)
        x = nn.relu(nn.Dense(self.out_size // 4)(x))
        x = nn.relu(nn.Dense(self.out_size // 2)(x))
        return nn.Dense(self.out_size)(x)


class MaskEncoder(nn.Module):
    """Embed the per-vertex mask code {0,1,2,3} (reference
    ``vision/model.py:403-414``; codes documented in active/env)."""

    out_size: int

    @nn.compact
    def __call__(self, mask: jnp.ndarray) -> jnp.ndarray:
        codes = jnp.squeeze(mask, axis=-1).astype(jnp.int32)
        return nn.Embed(4, self.out_size)(codes)


def mlp(sizes: list[int], activate_final: bool = False) -> Callable:
    """Returns a flax-compatible callable building Dense+ReLU stacks."""

    class _MLP(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i, s in enumerate(sizes):
                x = nn.Dense(s)(x)
                if i < len(sizes) - 1 or activate_final:
                    x = nn.relu(x)
            return x

    return _MLP()
