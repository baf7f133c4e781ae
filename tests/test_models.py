import jax
import jax.numpy as jnp
import numpy as np
import pytest

from active_3d_vision_and_touch_tpu.core import build_adj_info, touch_chart, vision_charts
from active_3d_vision_and_touch_tpu.models import (
    Deformation,
    MeshAutoEncoder,
    TouchChartEncoder,
    prepare_charts,
)
from active_3d_vision_and_touch_tpu.models.gcn import GCN, GCNLayer
from active_3d_vision_and_touch_tpu.models.vision import encoder_plan


SMALL = dict(num_gcn_layers=3, hidden_gcn_size=32, num_cnn_blocks=6, layers_per_block=1)


@pytest.fixture(scope="module")
def adj_info():
    return build_adj_info(vision_charts(), use_touch=True, num_fingers=4, num_grasps=2)


def test_gcn_layer_cut_shapes():
    layer = GCNLayer(out_features=30, cut=0.33, do_cut=True)
    feats = jnp.ones((2, 10, 16))
    adj = jnp.eye(10)[None].repeat(2, 0)[0]
    params = layer.init(jax.random.PRNGKey(0), feats, adj)
    out = layer.apply(params, feats, adj)
    assert out.shape == (2, 10, 30)


def test_gcn_stack_final_linear():
    gcn = GCN(num_layers=3, hidden_size=16, out_size=3)
    feats = jnp.ones((1, 8, 12))
    adj = jnp.eye(8)
    params = gcn.init(jax.random.PRNGKey(0), feats, adj)
    out = gcn.apply(params, feats, adj)
    assert out.shape == (1, 8, 3)


def test_touch_encoder_end_to_end():
    model = TouchChartEncoder()
    chart = jnp.asarray(touch_chart().verts)
    touch = jnp.zeros((2, 121, 121, 3))
    pos = jnp.array([[0.1, 0.0, 0.0], [0.0, 0.2, 0.0]])
    rot = jnp.stack([jnp.eye(3), jnp.eye(3)])
    variables = model.init(jax.random.PRNGKey(0), touch, pos, rot, chart)
    verts = model.apply(variables, touch, pos, rot, chart)
    assert verts.shape == (2, 25, 3)
    # rigid transform applied: chart center lands at ref position + offset
    assert "batch_stats" in variables

    # train mode updates batch stats
    verts2, updates = model.apply(
        variables, touch, pos, rot, chart, train=True, mutable=["batch_stats"]
    )
    assert verts2.shape == (2, 25, 3)
    assert jax.tree_util.tree_structure(updates["batch_stats"]) is not None


def test_encoder_plan_channels():
    specs, selected, channels = encoder_plan(6, 3, 5, 256)
    # final layer always selected; three intermediates
    assert len(channels) == 4
    assert channels == [64, 128, 256, 512]


@pytest.mark.parametrize("use_img,use_touch", [(True, True), (False, True), (True, False)])
def test_deformation_settings(adj_info, use_img, use_touch):
    info = adj_info if use_touch else build_adj_info(vision_charts(), use_touch=False)
    model = Deformation(use_img=use_img, use_touch=use_touch, **SMALL)
    b = 2
    mesh = jnp.asarray(vision_charts().verts)
    tc = jnp.zeros((b, 8, 25, 4)) if use_touch else None
    charts = prepare_charts(tc, mesh, b, use_touch=use_touch)
    img = jnp.zeros((b, 256, 256, 3)) if use_img else None
    adj = jnp.asarray(info.adj)
    orig = jnp.asarray(info.original)
    variables = model.init(jax.random.PRNGKey(0), img, charts, adj, orig)
    verts, mask = model.apply(variables, img, charts, adj, orig)
    assert verts.shape == (b, info.num_verts, 3)
    assert mask.shape == (b, info.num_verts, 1)
    # touch charts must be unchanged (measurements are never deformed)
    if use_touch:
        nv = info.num_vision_verts
        assert np.allclose(verts[:, nv:], charts["touch_charts"], atol=1e-6)


def test_autoencoder_roundtrip(adj_info):
    model = MeshAutoEncoder(
        encoding_size=16, num_gcn_layers=2, hidden_gcn_size=24, grid_size=8
    )
    b, v = 2, adj_info.num_verts
    verts = jnp.zeros((b, v, 3))
    mask = jnp.ones((b, v, 1))
    adj = jnp.asarray(adj_info.adj)
    variables = model.init(jax.random.PRNGKey(0), verts, mask, adj)
    points, latent = model.apply(variables, verts, mask, adj)
    assert latent.shape == (b, 16)
    assert points.shape == (b, 64, 3)
    only = model.apply(variables, verts, mask, adj, only_encode=True)
    assert np.allclose(only, latent)


def test_deformation_touch_global_context(adj_info):
    """The global touch-context pathway: contact statistics must reach every
    vision vertex (moving a contact changes the whole prediction) and the
    no-contact batch element must stay finite (the masked stats zero out)."""
    model = Deformation(use_img=False, use_touch=True, touch_global=True, **SMALL)
    b = 2
    mesh = jnp.asarray(vision_charts().verts)
    tc = np.zeros((b, 8, 25, 4), np.float32)
    # element 0: one successful contact chart away from the origin;
    # element 1: every slot failed (mask 0) — no contacts at all
    tc[0, 0, :, :3] = 0.4
    tc[0, 0, :, 3] = 2.0
    charts = prepare_charts(jnp.asarray(tc), mesh, b)
    adj = jnp.asarray(adj_info.adj)
    orig = jnp.asarray(adj_info.original)
    variables = model.init(jax.random.PRNGKey(0), None, charts, adj, orig)
    assert "touch_context" in variables["params"]
    verts, _ = model.apply(variables, None, charts, adj, orig)
    assert np.all(np.isfinite(np.asarray(verts)))
    # translate the contact chart: a purely local model would only move the
    # (frozen) touch verts, but the broadcast context shifts vision verts too
    tc2 = tc.copy()
    tc2[0, 0, :, :3] = -0.4
    charts2 = prepare_charts(jnp.asarray(tc2), mesh, b)
    verts2, _ = model.apply(variables, None, charts2, adj, orig)
    nv = adj_info.num_vision_verts
    delta = np.abs(np.asarray(verts2[0, :nv]) - np.asarray(verts[0, :nv])).max()
    assert delta > 1e-4
    # the contact-free element must be byte-identical (context is zeroed)
    assert np.allclose(verts2[1], verts[1], atol=1e-6)


def test_deformation_gradients_flow(adj_info):
    model = Deformation(use_img=False, use_touch=True, **SMALL)
    b = 1
    mesh = jnp.asarray(vision_charts().verts)
    charts = prepare_charts(jnp.zeros((b, 8, 25, 4)), mesh, b)
    adj = jnp.asarray(adj_info.adj)
    orig = jnp.asarray(adj_info.original)
    variables = model.init(jax.random.PRNGKey(0), None, charts, adj, orig)

    def loss_fn(params):
        verts, _ = model.apply({"params": params}, None, charts, adj, orig)
        return jnp.sum(verts**2)

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_flax_conv_matches_torch_conv():
    """Anchor the NHWC conv arithmetic (kernel 5, stride 2, pad 2) against
    torch's NCHW conv with identical weights — the touch CNN's layout
    contract."""
    torch = pytest.importorskip("torch")
    import flax.linen as fnn
    import numpy as np

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 121, 121, 3)).astype(np.float32)
    w = rng.normal(size=(5, 5, 3, 8)).astype(np.float32) * 0.1  # HWIO
    b = rng.normal(size=(8,)).astype(np.float32)

    conv = fnn.Conv(8, (5, 5), strides=(2, 2), padding=((2, 2), (2, 2)))
    out = conv.apply(
        {"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}},
        jnp.asarray(x),
    )

    t_out = torch.nn.functional.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(w).permute(3, 2, 0, 1),  # OIHW
        torch.from_numpy(b),
        stride=2,
        padding=2,
    ).permute(0, 2, 3, 1).numpy()

    assert out.shape == (2, 61, 61, 8)  # 121 -> 61, torch arithmetic
    assert np.allclose(np.asarray(out), t_out, atol=1e-4)


def test_gcn_layer_cut_semantics_golden():
    """Hand-computed check of the cut rule: only the first round(out*cut)
    features aggregate over the graph and receive bias (reference quirk,
    vision/model.py:351-363)."""
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(1, 3, 4)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(4, 6)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(6,)), jnp.float32)
    adj = jnp.asarray(
        np.array([[0.5, 0.5, 0.0], [0.0, 1.0, 0.0], [0.2, 0.3, 0.5]]), jnp.float32
    )
    layer = GCNLayer(out_features=6, cut=0.33, do_cut=True)
    out = layer.apply({"params": {"weight": w, "bias": b}}, feats, adj)

    fw = np.asarray(feats) @ np.asarray(w)
    length = round(6 * 0.33)  # = 2
    expected = np.concatenate(
        [np.asarray(adj) @ fw[0, :, :length] + np.asarray(b)[:length], fw[0, :, length:]],
        axis=-1,
    )
    assert np.allclose(np.asarray(out)[0], expected, atol=1e-5)

    # final (no-cut) layer: full aggregation + full bias
    layer2 = GCNLayer(out_features=6, do_cut=False)
    out2 = layer2.apply({"params": {"weight": w, "bias": b}}, feats, adj)
    expected2 = np.asarray(adj) @ fw[0] + np.asarray(b)
    assert np.allclose(np.asarray(out2)[0], expected2, atol=1e-5)


def test_chart_plane_features_analytic():
    """Grid-tangent plane fits recover a known tilted plane's normal (as
    n n^T, sign-invariant), report planarity ~1 for flat sheets, and zero
    out non-contact charts."""
    from active_3d_vision_and_touch_tpu.models.vision import chart_plane_features

    rng = np.random.default_rng(0)
    b, c, n = 2, 3, 5
    lin = np.linspace(-1.0, 1.0, n, dtype=np.float32)
    xx, yy = np.meshgrid(lin, lin, indexing="ij")
    # chart 0: plane with normal along a random unit vector
    normal = rng.normal(size=3)
    normal /= np.linalg.norm(normal)
    u = np.array([1.0, 0.0, 0.0]) - normal[0] * normal
    u /= np.linalg.norm(u)
    v = np.cross(normal, u)
    plane = xx[..., None] * u + yy[..., None] * v + 0.3
    t_pos = np.zeros((b, c * n * n, 3), np.float32)
    contact = np.zeros((b, c * n * n, 1), np.float32)
    t_pos[0, : n * n] = plane.reshape(-1, 3)
    contact[0, : n * n] = 1.0
    # chart 1 of element 0: non-planar noise, still contact
    t_pos[0, n * n : 2 * n * n] = rng.normal(size=(n * n, 3)).astype(np.float32)
    contact[0, n * n : 2 * n * n] = 1.0
    feats, has = chart_plane_features(jnp.asarray(t_pos), jnp.asarray(contact), n=n)
    feats = np.asarray(feats)
    has = np.asarray(has)
    assert feats.shape == (b, c, 8) and has.shape == (b, c, 1)
    iu, ju = np.triu_indices(3)
    want_nnt = np.outer(normal, normal)[iu, ju]
    assert np.allclose(feats[0, 0, :6], want_nnt, atol=1e-4)
    assert feats[0, 0, 6] > 0.999  # planarity ~1 for an exact plane
    assert feats[0, 0, 7] < 1e-3  # residual rms ~0
    assert feats[0, 1, 6] < 0.9  # noise chart is far from planar
    # non-contact charts (and the all-failed element) are exactly zero
    assert np.all(feats[0, 2] == 0.0)
    assert np.all(feats[1] == 0.0)
    assert has[0, 0] == 1.0 and has[1].sum() == 0.0


def test_deformation_touch_plane_pathway(adj_info):
    """touch_plane=True: plane features reach vision verts through the
    pooled context (rotating a contact chart in place changes the whole
    prediction) and the contact-free element stays unchanged + finite."""
    model = Deformation(
        use_img=False, use_touch=True, touch_global=True, touch_plane=True,
        **SMALL,
    )
    b = 2
    mesh = jnp.asarray(vision_charts().verts)
    lin = np.linspace(-0.05, 0.05, 5, dtype=np.float32)
    xx, yy = np.meshgrid(lin, lin, indexing="ij")
    flat = np.stack([xx, yy, np.zeros_like(xx)], -1).reshape(-1, 3)
    tc = np.zeros((b, 8, 25, 4), np.float32)
    tc[0, 0, :, :3] = flat + 0.3
    tc[0, 0, :, 3] = 2.0
    charts = prepare_charts(jnp.asarray(tc), mesh, b)
    adj = jnp.asarray(adj_info.adj)
    orig = jnp.asarray(adj_info.original)
    variables = model.init(jax.random.PRNGKey(0), None, charts, adj, orig)
    assert "plane_context" in variables["params"]
    assert "plane_vertex" in variables["params"]
    verts, _ = model.apply(variables, None, charts, adj, orig)
    assert np.all(np.isfinite(np.asarray(verts)))
    # rotate the chart 90 degrees about x IN PLACE (same centroid, same
    # point statistics up to axis swap — but a different surface plane)
    rot = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)
    tc2 = tc.copy()
    tc2[0, 0, :, :3] = flat @ rot.T + 0.3
    charts2 = prepare_charts(jnp.asarray(tc2), mesh, b)
    verts2, _ = model.apply(variables, None, charts2, adj, orig)
    nv = adj_info.num_vision_verts
    delta = np.abs(np.asarray(verts2[0, :nv]) - np.asarray(verts[0, :nv])).max()
    assert delta > 1e-4
    assert np.allclose(verts2[1], verts[1], atol=1e-6)
