"""Vision mesh deformation: image + touch charts → full surface mesh.

The flagship reconstruction model.  A two-tower CNN pyramid encodes the RGB
observation; chart vertices are projected into the image through the shared
:class:`core.camera.PinholeCamera` and pool bilinear features from selected
pyramid levels; positional (NeRF) and mask embeddings complete the vertex
features; three GCN refinement stages deform the vision charts toward the
object surface (touch charts stay fixed — they are measurements).

Capability-parity with the reference Deformation network
(``reconstruction/vision/model.py:27-439``), redesigned NHWC/flax-native
with the camera matrix derived from the shared camera instead of hard-coded.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from active_3d_vision_and_touch_tpu.core.camera import PinholeCamera
from active_3d_vision_and_touch_tpu.models.gcn import (
    GCN,
    MaskEncoder,
    PositionalEncoder,
)
from active_3d_vision_and_touch_tpu.ops.grid_sample import bilinear_sample


def encoder_plan(
    num_blocks: int = 6,
    layers_per_block: int = 3,
    kernel: int = 5,
    image_size: int = 256,
):
    """Static plan of the CNN pyramid: which layers run before the spatial
    size drops below the kernel, and which produce pooled feature maps.

    Returns (layer_specs, selected_ids, pooled_channels): layer_specs is a
    list of (features, stride, simple); selected_ids the indices whose
    outputs are pooled (3 intermediate + the final layer).
    """
    specs = [(3, 1, True)]
    cur, nxt = 3, 16
    for _ in range(num_blocks):
        specs.append((nxt, 2, False))
        cur = nxt
        nxt *= 2
        for _ in range(layers_per_block - 1):
            specs.append((cur, 1, False))
    total = len(specs)
    selections = {total - 1 - (i + 1) * layers_per_block for i in range(3)}

    run, selected, channels = [], [], []
    size = image_size
    for e, (feats, stride, simple) in enumerate(specs):
        if size < kernel:
            break
        run.append((feats, stride, simple))
        size = size // stride if stride > 1 else size
        if e in selections:
            selected.append(e)
            channels.append(feats)
    selected.append(len(run) - 1)
    channels.append(run[-1][0])
    return run, selected, channels


class ImageEncoder(nn.Module):
    """CNN pyramid over the 256x256 RGB image; returns the pooled maps."""

    num_blocks: int = 6
    layers_per_block: int = 3
    kernel: int = 5

    @nn.compact
    def __call__(self, img: jnp.ndarray, train: bool = False) -> list[jnp.ndarray]:
        specs, selected, _ = encoder_plan(
            self.num_blocks, self.layers_per_block, self.kernel, img.shape[1]
        )
        feats = []
        x = img
        for e, (features, stride, simple) in enumerate(specs):
            if not simple:
                x = nn.relu(nn.BatchNorm(use_running_average=not train)(x))
            pad = (self.kernel - 1) // 2
            x = nn.Conv(
                features,
                (self.kernel, self.kernel),
                strides=(stride, stride),
                padding=((pad, pad), (pad, pad)),
            )(x)
            if e in selected:
                feats.append(x)
        return feats


def pool_image_features(
    feature_maps: list[jnp.ndarray],
    verts: jnp.ndarray,
    camera: PinholeCamera,
) -> jnp.ndarray:
    """Project vertices through the camera and gather bilinear features from
    every pyramid level (reference ``vision/model.py:70-103``)."""
    grid = camera.normalized_grid(verts, xp=jnp)
    pooled = [bilinear_sample(fmap, grid) for fmap in feature_maps]
    return jnp.concatenate(pooled, axis=-1)


def chart_plane_features(
    t_pos: jnp.ndarray, contact: jnp.ndarray, n: int = 5
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-chart plane features from the 5x5 touch-chart grids.

    A contact chart pins the LOCAL SURFACE PLANE exactly — the strongest
    signal for orienting v4's thin slab faces (by-family diagnostic:
    slabs were the worst touch-exploitation tail at 86.5% CD remaining,
    results_r4/touch_value_by_family.json).  The chart is a deformed
    row-major (n x n) sheet (core/mesh.py::touch_chart), so grid tangents
    give a closed-form normal without an eigendecomposition (and without
    eigh's degenerate-gradient pathologies on the zero-padded empty
    slots).  No reference counterpart — the reference never feeds chart
    geometry back as an explicit orientation feature.

    Returns ``(feats, has)``: feats (B, C, 8) = [n n^T upper triangle (6)
    | planarity | residual rms] per chart — n n^T is sign-invariant, so
    the arbitrary tangent orientation of the predicted sheet cannot flip
    the feature — and has (B, C, 1) the per-chart contact indicator.
    Non-contact charts are zeroed.
    """
    B, V, _ = t_pos.shape
    C = V // (n * n)
    tc = t_pos.reshape(B, C, n, n, 3)
    # robust to per-point masks: a chart counts as contact if ANY slot does
    # (identical under the current per-chart mask-code invariant)
    has = contact.reshape(B, C, n * n, 1).max(axis=2)
    tu = (tc[:, :, 1:, :, :] - tc[:, :, :-1, :, :]).mean(axis=(2, 3))
    tv = (tc[:, :, :, 1:, :] - tc[:, :, :, :-1, :]).mean(axis=(2, 3))
    # double-where guard: padded (and degenerate) charts have a zero cross
    # product, and the norm VJP at zero is NaN — a jnp.maximum on the norm
    # alone does not stop it (0 * NaN = NaN through the unselected branch).
    # Substitute a safe unit vector INSIDE the norm so no NaN cotangent can
    # flow if charts ever become differentiable inputs.
    cross = jnp.cross(tu, tv)
    degen = jnp.sum(jnp.square(cross), axis=-1, keepdims=True) < 1e-24
    e3 = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], t_pos.dtype), cross.shape)
    safe = jnp.where(degen, e3, cross)
    nrm = safe / jnp.linalg.norm(safe, axis=-1, keepdims=True)
    flat = tc.reshape(B, C, n * n, 3)
    d = flat - flat.mean(axis=2, keepdims=True)
    var_n = jnp.square((d * nrm[:, :, None, :]).sum(-1)).mean(-1)  # (B, C)
    tot = jnp.square(d).sum(-1).mean(-1)
    planarity = 1.0 - var_n / jnp.maximum(tot, 1e-12)
    rms = jnp.sqrt(var_n + 1e-12)
    iu, ju = jnp.triu_indices(3)
    nnt = (nrm[..., :, None] * nrm[..., None, :])[..., iu, ju]  # (B, C, 6)
    feats = jnp.concatenate(
        [nnt, planarity[..., None], rms[..., None]], axis=-1
    )
    return feats * has, has


class Deformation(nn.Module):
    """Three-stage GCN chart deformation."""

    use_img: bool = True
    use_touch: bool = True
    touch_global: bool = False
    touch_plane: bool = False
    num_gcn_layers: int = 20
    hidden_gcn_size: int = 300
    cut: float = 0.33
    num_cnn_blocks: int = 6
    layers_per_block: int = 3
    cnn_kernel: int = 5
    camera: PinholeCamera = PinholeCamera()

    @property
    def feature_size(self) -> int:
        if not self.use_img:
            return 50
        _, _, channels = encoder_plan(
            self.num_cnn_blocks, self.layers_per_block, self.cnn_kernel
        )
        return sum(channels)

    @nn.compact
    def __call__(
        self,
        img: jnp.ndarray | None,
        charts: dict,
        adj: jnp.ndarray,
        original_adj: jnp.ndarray,
        train: bool = False,
        img_features: tuple | None = None,
    ):
        """Returns (verts (B, V, 3), mask (B, V, 1)).

        ``charts``: dict with vision_charts/vision_masks and (if use_touch)
        touch_charts/touch_masks, see :func:`prepare_charts`.
        """
        fsize = self.feature_size
        positional = PositionalEncoder(fsize)
        mask_enc = MaskEncoder(fsize)
        gcn_1 = GCN(self.num_gcn_layers, self.hidden_gcn_size, 3, self.cut)
        gcn_2 = GCN(self.num_gcn_layers, self.hidden_gcn_size, 3, self.cut)

        vc = charts["vision_charts"].shape[1]

        # ---- global touch context (ours, no reference counterpart):
        # successful contacts pin the object's gross scale/pose — GLOBAL
        # entropy that local GCN message passing cannot carry from the
        # seam-stitched chart vertices to the whole atlas (measured: on the
        # v4 distribution the 0->5-grasp CD cut was ~0 without this).  Pool
        # the contact charts' positional features (masked mean + max) into
        # one vector per object, broadcast to every vertex at every stage.
        touch_ctx = None
        if self.use_touch and self.touch_global:
            t_pos = charts["touch_charts"]
            contact = (charts["touch_masks"] == 2.0).astype(t_pos.dtype)
            t_feat = positional(t_pos)  # params shared with vertex encoding
            n_contact = jnp.maximum(contact.sum(axis=1), 1.0)
            has = contact.sum(axis=1) > 0  # (B, 1)
            ctx_mean = (t_feat * contact).sum(axis=1) / n_contact
            masked = jnp.where(contact > 0, t_feat, -1e9)
            ctx_max = jnp.where(has, masked.max(axis=1), 0.0)
            # raw per-axis coordinate statistics of the contact set: v4's
            # global entropy is per-axis scale, and contacts lower-bound the
            # extent along their directions — min/max/mean/std per axis give
            # the scale estimate directly instead of asking the MLP to
            # invert the NeRF embedding (measured on v4 t_g: valid CD
            # 37.2 -> 31.6, 0->5-grasp cut 18.1% -> 27.8%).
            p_mean = (t_pos * contact).sum(axis=1) / n_contact
            p_max = jnp.where(has, jnp.where(contact > 0, t_pos, -1e9).max(axis=1), 0.0)
            p_min = jnp.where(has, jnp.where(contact > 0, t_pos, 1e9).min(axis=1), 0.0)
            p_var = (jnp.square(t_pos - p_mean[:, None, :]) * contact).sum(
                axis=1
            ) / n_contact
            frac = contact.mean(axis=1)  # fraction of slots with contact
            stats = jnp.where(
                has,
                jnp.concatenate(
                    [p_mean, p_max, p_min, jnp.sqrt(p_var + 1e-8)], axis=-1
                ),
                0.0,
            )
            touch_ctx = nn.Dense(fsize, name="touch_context")(
                jnp.concatenate(
                    [ctx_mean, ctx_max, 3.0 * stats, frac], axis=-1
                )
            )[:, None, :]

        # ---- per-contact plane features (ours): each chart's fitted plane
        # orients the local surface exactly — pooled into the global context
        # AND broadcast per-vertex so the GCN can orient thin slab faces
        # (the measured worst touch-exploitation family on v4).
        plane_tail = None
        if self.use_touch and self.touch_plane:
            t_pos = charts["touch_charts"]
            contact = (charts["touch_masks"] == 2.0).astype(t_pos.dtype)
            pf, phas = chart_plane_features(t_pos, contact)
            n_charts = jnp.maximum(phas.sum(axis=1), 1.0)
            any_c = phas.sum(axis=1) > 0  # (B, 1)
            pf_mean = pf.sum(axis=1) / n_charts
            pf_max = jnp.where(
                any_c, jnp.where(phas > 0, pf, -1e9).max(axis=1), 0.0
            )
            plane_ctx = nn.Dense(fsize, name="plane_context")(
                jnp.concatenate([pf_mean, pf_max], axis=-1)
            )[:, None, :]
            touch_ctx = plane_ctx if touch_ctx is None else touch_ctx + plane_ctx
            verts_per_chart = t_pos.shape[1] // pf.shape[1]
            plane_tail = nn.Dense(fsize, name="plane_vertex")(
                jnp.repeat(pf, verts_per_chart, axis=1)
            )

        def with_plane_tail(features: jnp.ndarray) -> jnp.ndarray:
            # add per-vertex plane features at the touch-vert tail [vc:]
            if plane_tail is None or features.shape[1] == vc:
                return features
            return jnp.concatenate(
                [features[:, :vc], features[:, vc:] + plane_tail], axis=1
            )

        if img_features is not None:
            global_feats, local_feats = img_features
        elif self.use_img:
            global_feats = ImageEncoder(
                self.num_cnn_blocks, self.layers_per_block, self.cnn_kernel
            )(img, train=train)
            local_feats = ImageEncoder(
                self.num_cnn_blocks, self.layers_per_block, self.cnn_kernel
            )(img, train=train)
        else:
            global_feats, local_feats = [], []

        # ---- stage 1: touch-only starts fused; vision starts charts-only
        if self.use_touch and not self.use_img:
            vertices = jnp.concatenate(
                [charts["vision_charts"], charts["touch_charts"]], axis=1
            )
            mask = jnp.concatenate(
                [charts["vision_masks"], charts["touch_masks"]], axis=1
            )
            features = with_plane_tail(positional(vertices) + mask_enc(mask))
            if touch_ctx is not None:
                features = features + touch_ctx
            stage1_adj = adj
        else:
            vertices = charts["vision_charts"]
            mask = charts["vision_masks"]
            features = positional(vertices) + mask_enc(mask)
            if touch_ctx is not None:
                features = features + touch_ctx
            if self.use_img:
                features = features + pool_image_features(
                    global_feats, vertices, self.camera
                )
            # with image features, stage 1 deforms the vision atlas alone
            stage1_adj = original_adj if self.use_img else adj
        update = gcn_1(features, stage1_adj)
        vertices = jnp.concatenate(
            [vertices[:, :vc] + update[:, :vc], vertices[:, vc:]], axis=1
        )

        # ---- stage 2: append touch charts if not already present
        if self.use_touch and self.use_img:
            vertices = jnp.concatenate([vertices, charts["touch_charts"]], axis=1)
            mask = jnp.concatenate(
                [charts["vision_masks"], charts["touch_masks"]], axis=1
            )
        mask_features = mask_enc(mask)
        features = with_plane_tail(positional(vertices) + mask_features)
        if touch_ctx is not None:
            features = features + touch_ctx
        if self.use_img:
            features = features + pool_image_features(
                local_feats, vertices, self.camera
            )
        update = gcn_2(features, adj)
        vertices = jnp.concatenate(
            [vertices[:, :vc] + update[:, :vc], vertices[:, vc:]], axis=1
        )

        # ---- stage 3: same GCN (shared weights), refreshed features
        features = with_plane_tail(positional(vertices) + mask_features)
        if touch_ctx is not None:
            features = features + touch_ctx
        if self.use_img:
            features = features + pool_image_features(
                local_feats, vertices, self.camera
            )
        update = gcn_2(features, adj)
        vertices = jnp.concatenate(
            [vertices[:, :vc] + update[:, :vc], vertices[:, vc:]], axis=1
        )
        return vertices, mask


def prepare_charts(
    touch_charts: jnp.ndarray | None,
    vision_mesh: jnp.ndarray,
    batch_size: int,
    use_touch: bool = True,
) -> dict:
    """Assemble the model-input chart dict (reference ``prepare_mesh``,
    ``vision/model.py:418-439``).

    ``touch_charts``: (B, ..., 25, 4) stacked [xyz | mask] slots from the
    data pipeline; ``vision_mesh``: (Vv, 3) canonical atlas.  Vision verts
    always carry mask code 3.
    """
    vision_charts = jnp.broadcast_to(
        vision_mesh[None], (batch_size,) + vision_mesh.shape
    )
    vision_masks = 3.0 * jnp.ones(vision_charts.shape[:-1] + (1,), vision_mesh.dtype)
    charts = {"vision_charts": vision_charts, "vision_masks": vision_masks}
    if use_touch:
        info = touch_charts.reshape(batch_size, -1, 4)
        charts["touch_charts"] = info[..., :3]
        charts["touch_masks"] = info[..., 3:]
    return charts
