"""CelebA family tests: SAGAN blocks, ResNet encoder, dual-latent model,
train step. Small sizes (32-64px) to stay CPU-friendly."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from cdgvae_tpu.models import sagan
from cdgvae_tpu.models.resnet import ResNetEncoder
from cdgvae_tpu.models.celeba import (CelebACDGVAE, celeba_B, SMILE_NODES,
                                      BLOCK_GROUPS)
from cdgvae_tpu.ops.causal import CausalGraph, is_dag
from cdgvae_tpu.data.celeba import CelebADataset, synthetic_celeba
from cdgvae_tpu.train.celeba_steps import make_celeba_step


def test_spectral_norm_bounds_singular_value():
    p = sagan.snlinear_init(jax.random.key(0), 16, 8)
    p = dict(p, w=p["w"] * 50.0)  # blow up the weight
    x = jax.random.normal(jax.random.key(1), (4, 16))
    y = sagan.snlinear(p, x)
    # normalized weight has spectral norm ~1 => output norm bounded
    w_eff = p["w"] / sagan._sn_sigma(p["w"].T, p["u"])
    s = np.linalg.svd(np.asarray(w_eff), compute_uv=False)[0]
    assert 0.9 < s < 1.5
    assert np.isfinite(np.asarray(y)).all()


def test_sn_stateful_refresh_tracks_spectral_norm():
    """sn_refresh advances (u, v) like torch's stateful spectral_norm:
    after a few refreshes against a CHANGED weight, the in-forward sigma
    (u @ W @ v, constants) matches the true top singular value."""
    p = sagan.snconv_init(jax.random.key(0), 8, 16, 3)
    assert "v" in p  # stateful from init, warm-started
    # replace the weight: stored (u, v) are now stale
    w_new = jax.random.normal(jax.random.key(1), p["w"].shape)
    p = dict(p, w=w_new)
    for _ in range(20):
        p = sagan.sn_refresh(p)
    w2d = np.asarray(p["w"]).reshape(-1, p["w"].shape[-1]).T
    sigma = float(np.asarray(p["u"]) @ w2d @ np.asarray(p["v"]))
    top = np.linalg.svd(w2d, compute_uv=False)[0]
    assert abs(sigma - top) / top < 1e-3


def test_sn_refresh_keeps_legacy_sites_structure_invariant():
    """Sites without stored "v" (stateless-era checkpoints) must pass
    through sn_refresh bit-identical — the hook runs as a lax.scan carry
    update, so the pytree structure cannot change — and the forward must
    still work via the legacy in-forward estimate."""
    p = sagan.snlinear_init(jax.random.key(0), 16, 8)
    legacy = {k: v for k, v in p.items() if k != "v"}
    tree = {"site": legacy, "other": {"w": jnp.ones((3,))}}
    out = sagan.sn_refresh(tree)
    assert jax.tree_util.tree_structure(out) == \
        jax.tree_util.tree_structure(tree)
    np.testing.assert_array_equal(np.asarray(out["site"]["u"]),
                                  np.asarray(legacy["u"]))
    y = sagan.snlinear(legacy, jnp.ones((2, 16)))
    assert np.isfinite(np.asarray(y)).all()


def test_upsample2_matches_image_resize_nearest():
    x = jax.random.normal(jax.random.key(0), (2, 5, 7, 3))
    ref = jax.image.resize(x, (2, 10, 14, 3), method="nearest")
    np.testing.assert_array_equal(np.asarray(sagan._upsample2(x)),
                                  np.asarray(ref))


def test_self_attn_shape_and_identity_at_init():
    p = sagan.self_attn_init(jax.random.key(0), 32)
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 32))
    y = sagan.self_attn(p, x)
    assert y.shape == x.shape
    # sigma starts at 0 => exact identity (sagan.py:42, :72)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


@pytest.mark.slow
def test_generator_output():
    gen = sagan.Generator(latent_dim=2, conv_dim=8, image_size=64)
    p = gen.init(jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (2, 2))
    img = gen(p, z, jax.random.key(2))
    assert img.shape == (2, 64, 64, 3)
    x = np.asarray(img)
    assert x.min() >= -1.0 and x.max() <= 1.0


def test_discriminator_mlp_variant():
    # reference sagan.py:362-395: residual SN-MLP; out_feature returns
    # (logit, penultimate features)
    d = sagan.DiscriminatorMLP(in_channels=6, out_channels=16, num_block=3)
    p = d.init(jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (4, 6))
    out, f = d(p, z)
    assert out.shape == (4, 1) and f.shape == (4, 16)
    d2 = sagan.DiscriminatorMLP(6, 16, out_feature=False, num_block=1)
    p2 = d2.init(jax.random.key(0))
    assert d2(p2, z).shape == (4, 1)
    assert "block2" not in p2  # num_block respected (reference :371-374)


@pytest.mark.slow
def test_dc_discriminator_variant():
    # reference sagan.py:398-414; fc sized from real post-conv dims (the
    # reference's hardcoded 4*4 only matches image_size=32)
    for size in (32, 64):
        d = sagan.DCDiscriminator(conv_dim=8, image_size=size)
        p = d.init(jax.random.key(0))
        x = jax.random.normal(jax.random.key(1), (2, size, size, 3))
        assert d(p, x).shape == (2, 1)


def test_resnet_encoder_freeze_trunk():
    enc = ResNetEncoder(out_dim=24, freeze_trunk=True)
    p = enc.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
    out = enc(p, x)
    assert out.shape == (2, 24)

    def loss(p):
        return (enc(p, x) ** 2).sum()

    g = jax.grad(loss)(p)
    # trunk grads are zero; fc grads are not
    assert float(jnp.abs(g["stem_conv"]["w"]).max()) == 0.0
    assert float(jnp.abs(g["fc"]["w"]).max()) > 0.0


@pytest.mark.slow
def test_celeba_model_and_step():
    B = celeba_B(SMILE_NODES, 0)
    assert is_dag(B)
    graph = CausalGraph(B, scm="linear")
    model = CelebACDGVAE(graph, latent_dim=6, image_size=32, conv_dim=4)
    params = model.init(jax.random.key(0))

    x, y = synthetic_celeba(n=4, img_size=32, seed=0)
    x, y = jnp.asarray(x), jnp.asarray(y)
    out = model(params, x, rng=jax.random.key(1))
    assert out.xhat.shape == (4, 32, 32, 3)
    assert out.latent.shape == (4, 6)
    assert out.epsilon2.shape == (4, 6)
    assert len(out.xhat_separated) == 5

    opt = optax.adam(1e-3)
    step = make_celeba_step(model, opt, beta=0.1, lam=5.0)
    state = (params, opt.init(params))
    for i in range(2):
        *state, m = step(*state, x, y, jax.random.key(i))
    assert np.isfinite(m["loss"])
    assert {"loss", "recon", "KL", "alignment", "active"} == set(m)


def test_stacked_decoder_matches_per_generator():
    """The stacked (vmapped) 5-generator decoder is functionally identical
    to the per-generator path on converted params: same init keys, same
    rng stream, same masks => same images (up to conv-grouping float
    reassociation)."""
    B = celeba_B(SMILE_NODES, 0)
    graph = CausalGraph(B, scm="linear")
    sep = CelebACDGVAE(graph, latent_dim=6, image_size=32, conv_dim=4,
                       stacked=False)
    stk = CelebACDGVAE(graph, latent_dim=6, image_size=32, conv_dim=4,
                       stacked=True)
    p_sep = sep.init(jax.random.key(0))
    # init uses the same per-generator keys, so converting the separate
    # params must reproduce the stacked init bit-exactly
    p_conv = sep.stack_decoder(p_sep)
    p_stk = stk.init(jax.random.key(0))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), p_conv, p_stk)

    latent = jax.random.normal(jax.random.key(1), (2, 6))
    eps2 = jax.random.normal(jax.random.key(2), (2, 6))
    masks = (jax.random.uniform(jax.random.key(3), (2, 32, 32, 5))
             > 0.5).astype(jnp.float32)
    seps_a, xhat_a = sep.decode(p_sep, latent, eps2, masks,
                                jax.random.key(4))
    seps_b, xhat_b = stk.decode(p_conv, latent, eps2, masks,
                                jax.random.key(4))
    assert len(seps_b) == 5
    for a, b in zip(seps_a, seps_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(xhat_a), np.asarray(xhat_b),
                               rtol=1e-4, atol=1e-5)


def test_stacked_decoder_padded_rows_stay_zero_through_training():
    """Zero-padded input-linear rows receive zero gradient (their z inputs
    are structurally zero), so Adam leaves them at exactly zero — padding
    never leaks into the math as weights drift."""
    B = celeba_B(SMILE_NODES, 0)
    graph = CausalGraph(B, scm="linear")
    model = CelebACDGVAE(graph, latent_dim=6, image_size=32, conv_dim=4,
                         stacked=True)
    params = model.init(jax.random.key(0))
    x, y = synthetic_celeba(n=4, img_size=32, seed=0)
    x, y = jnp.asarray(x), jnp.asarray(y)
    opt = optax.adam(1e-3)
    step = make_celeba_step(model, opt, beta=0.1, lam=5.0)
    state = (params, opt.init(params))
    for i in range(3):
        *state, m = step(*state, x, y, jax.random.key(i))
    assert np.isfinite(m["loss"])
    w = np.asarray(state[0]["decoder"]["stacked"]["block0"]["linear"]["w"])
    z_dims = [len(g) for g in BLOCK_GROUPS] + [6]
    for k, zd in enumerate(z_dims):
        np.testing.assert_array_equal(w[k, zd:], 0.0)
        assert np.abs(w[k, :zd]).max() > 0


def test_masked_gam_blocks_respect_masks():
    """A decoder block's contribution is zeroed outside its mask channel."""
    B = celeba_B(SMILE_NODES, 0)
    graph = CausalGraph(B, scm="linear")
    model = CelebACDGVAE(graph, latent_dim=6, image_size=32, conv_dim=4)
    params = model.init(jax.random.key(0))
    latent = jax.random.normal(jax.random.key(1), (2, 6))
    eps2 = jax.random.normal(jax.random.key(2), (2, 6))
    masks = jnp.zeros((2, 32, 32, 5)).at[..., 0].set(1.0)
    seps, xhat = model.decode(params, latent, eps2, masks,
                              jax.random.key(3))
    expect = jnp.tanh(seps[0])  # only block 0 passes its mask
    np.testing.assert_allclose(np.asarray(xhat), np.asarray(expect),
                               rtol=1e-5, atol=1e-6)


def test_celeba_dataset_synthetic_fallback():
    ds = CelebADataset(data_dir="/nonexistent", train=True, img_size=32,
                       synthetic_n=6)
    assert ds.x_data.shape == (6, 32, 32, 8)
    assert ds.y_data.shape == (6, 6)
    assert ds.nodes == SMILE_NODES
    assert set(np.unique(ds.x_data[..., 3:])) <= {0.0, 1.0}


def test_synthetic_attributes_all_visible():
    """Every one of the 6 attributes must be recoverable from pixels alone
    (round-1 finding: Smiling/High_Cheekbones were invisible in the
    fallback renderer, making 2 of 6 attribute validations vacuous). A
    least-squares pixel probe must separate each attribute near-perfectly
    on held-out renders."""
    x, y = synthetic_celeba(n=192, img_size=64, seed=3)
    px = x[:, ::2, ::2, :3].reshape(192, -1)
    px = np.concatenate([px, np.ones((192, 1))], 1)
    tr, te = slice(0, 144), slice(144, 192)
    for j, name in enumerate(SMILE_NODES):
        w = np.linalg.lstsq(px[tr], y[tr, j] * 2 - 1, rcond=1e-3)[0]
        acc = ((px[te] @ w > 0) == (y[te, j] > 0.5)).mean()
        assert acc >= 0.95, f"{name} not visible in renderer: probe {acc}"


def test_block_groups_wiring():
    # smile structure: [smile,cheek],[smile,mouth],[smile,chubby],
    # [smile,male,eyes] (celeba/module/model.py:189-195)
    assert BLOCK_GROUPS == ([0, 2], [0, 3], [0, 4], [0, 1, 5])


def _make_hq_corpus(tmp_path, n=3):
    """Tiny CelebAMask-HQ-layout corpus: images + part-mask PNGs +
    attribute annotation file. Returns the base dir."""
    import cv2

    base = tmp_path / "CelebAMask-HQ"
    (base / "CelebA-HQ-img").mkdir(parents=True)
    (base / "CelebAMask-HQ-mask-anno" / "0").mkdir(parents=True)

    attrs = ("5_o_Clock_Shadow Arched_Eyebrows Attractive Bags_Under_Eyes "
             "Bald Bangs Big_Lips Big_Nose Black_Hair Blond_Hair Blurry "
             "Brown_Hair Bushy_Eyebrows Chubby Double_Chin Eyeglasses "
             "Goatee Gray_Hair Heavy_Makeup High_Cheekbones Male "
             "Mouth_Slightly_Open Mustache Narrow_Eyes No_Beard Oval_Face "
             "Pale_Skin Pointy_Nose Receding_Hairline Rosy_Cheeks Sideburns "
             "Smiling Straight_Hair Wavy_Hair Wearing_Earrings Wearing_Hat "
             "Wearing_Lipstick Wearing_Necklace Wearing_Necktie Young")
    n_attr = len(attrs.split())
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        img = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
        cv2.imwrite(str(base / "CelebA-HQ-img" / f"{i}.jpg"), img)
        # part masks for a subset of parts; some parts deliberately missing
        for part in ["skin", "mouth", "l_eye", "hair"]:
            m = np.zeros((512, 512, 3), dtype=np.uint8)
            m[100 + 50 * i: 200 + 50 * i, 100:300] = 255
            cv2.imwrite(str(base / "CelebAMask-HQ-mask-anno" / "0" /
                            f"{i:05d}_{part}.png"), m)
        vals = rng.choice([-1, 1], n_attr)
        rows.append(f"{i}.jpg " + " ".join(str(v) for v in vals))
    anno = [str(n), attrs] + rows
    (base / "CelebAMask-HQ-attribute-anno.txt").write_text(
        "\n".join(anno) + "\n")
    return base


def test_preprocess_synthetic_corpus(tmp_path):
    """End-to-end preprocess on a tiny generated CelebAMask-HQ-layout corpus
    (reference celeba/preprocess.py): images + part-mask PNGs + attribute
    annotation file -> [H,W,8] npy + 6-dim labels, loadable by CelebADataset."""
    from cdgvae_tpu.data.celeba import preprocess

    n = 3
    base = _make_hq_corpus(tmp_path, n)
    out = tmp_path / "out"
    preprocess(str(base), str(out), causal_structure="smile", img_size=64,
               train=True)

    ds = CelebADataset(data_dir=str(out), causal_structure=0, train=True,
                       img_size=64)
    assert ds.x_data.shape == (n, 64, 64, 8)
    assert ds.y_data.shape == (n, 6)
    # RGB channels normalized to [0,1]; mask channels binary
    assert ds.x_data[..., :3].min() >= 0.0 and ds.x_data[..., :3].max() <= 1.0
    assert set(np.unique(ds.x_data[..., 3:])) <= {0.0, 1.0}
    assert set(np.unique(ds.y_data)) <= {0.0, 1.0}
    # mask group 0 (skin) must be non-empty, group for missing parts empty
    assert ds.x_data[..., 3].sum() > 0


def test_preprocess_split_selection(tmp_path):
    """preprocess must SPLIT the corpus, not copy it whole into both
    trees (regression: the train flag used to only pick the output dir —
    a train/test leak). With list_eval_partition.txt present, partition
    0 -> train and 2 -> test with the reference's lstrip('0') filename
    matching (celeba/preprocess.py:20-26); without it, a deterministic
    disjoint 80/20 fallback."""
    import os
    from cdgvae_tpu.data.celeba import preprocess

    base = _make_hq_corpus(tmp_path, n=6)
    # zero-padded original-CelebA-style names, as in the real file
    (base / "list_eval_partition.txt").write_text(
        "000001.jpg 0\n000002.jpg 1\n000003.jpg 2\n"
        "000004.jpg 0\n000005.jpg 2\n")

    def saved(out, tag):
        d = os.path.join(out, tag, "smile")
        return sorted(int(f[:-4]) for f in os.listdir(d)) \
            if os.path.isdir(d) else []

    out = str(tmp_path / "out_part")
    preprocess(str(base), out, causal_structure="smile", img_size=32,
               train=True)
    preprocess(str(base), out, causal_structure="smile", img_size=32,
               train=False)
    assert saved(out, "train") == [1, 4]   # partition 0
    assert saved(out, "test") == [3, 5]    # partition 2 (1=val dropped)

    (base / "list_eval_partition.txt").unlink()
    out2 = str(tmp_path / "out_fallback")
    preprocess(str(base), out2, causal_structure="smile", img_size=32,
               train=True)
    preprocess(str(base), out2, causal_structure="smile", img_size=32,
               train=False)
    tr, te = saved(out2, "train"), saved(out2, "test")
    assert tr and te and not set(tr) & set(te)
    assert sorted(tr + te) == list(range(6))


@pytest.mark.slow
def test_resnet_depth_variants():
    """All three reference depths (celeba/module/resnet.py ships 18/34/50)
    produce the right feature head; resnet50 uses bottleneck (4x) widths."""
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    for depth, blocks in [("resnet34", "layer1_3"), ("resnet50", "layer3_2")]:
        enc = ResNetEncoder(out_dim=7, depth=depth, freeze_trunk=False)
        params = enc.init(jax.random.key(0))
        assert blocks in params
        out = enc(params, x)
        assert out.shape == (2, 7)
        assert bool(jnp.all(jnp.isfinite(out)))
    # bottleneck expansion: resnet50 fc input is 2048
    enc50 = ResNetEncoder(out_dim=3, depth="resnet50")
    assert enc50.init(jax.random.key(1))["fc"]["w"].shape == (2048, 3)


@pytest.mark.slow
def test_celeba_bf16_step_keeps_f32_state():
    """Mixed precision: network in bf16, params/opt/losses f32; loss close
    to the f32 step's at init."""
    B = celeba_B(SMILE_NODES, 0)
    graph = CausalGraph(B, scm="linear")
    model = CelebACDGVAE(graph, latent_dim=6, image_size=32, conv_dim=4)
    x, y = synthetic_celeba(n=4, img_size=32, seed=0)
    x, y = jnp.asarray(x), jnp.asarray(y)
    opt = optax.adam(1e-3)

    losses = {}
    for dt in (None, jnp.bfloat16):
        params = model.init(jax.random.key(0))
        step = make_celeba_step(model, opt, beta=0.1, lam=5.0,
                                compute_dtype=dt)
        p2, _, m = step(params, opt.init(params), x, y, jax.random.key(1))
        losses[dt] = float(m["loss"])
        assert all(l.dtype == jnp.float32
                   for l in jax.tree_util.tree_leaves(p2))
        assert m["loss"].dtype == jnp.float32
    assert abs(losses[None] - losses[jnp.bfloat16]) / losses[None] < 0.05


def test_attractive_structure():
    """causal_structure=1 ('attractive'): its DAG is valid and the model
    forward works; the reference uses the same latent index groups for both
    structures (celeba/module/model.py:190-195)."""
    from cdgvae_tpu.models.celeba import ATTRACTIVE_NODES
    B = celeba_B(ATTRACTIVE_NODES, 1)
    assert is_dag(B)
    assert B[ATTRACTIVE_NODES.index("Young"),
             ATTRACTIVE_NODES.index("Chubby")] > 0
    graph = CausalGraph(B, scm="linear")
    model = CelebACDGVAE(graph, latent_dim=6, image_size=32, conv_dim=4)
    params = model.init(jax.random.key(0))
    x, _ = synthetic_celeba(n=2, img_size=32, seed=0)
    out = model(params, jnp.asarray(x), rng=jax.random.key(1))
    assert out.xhat.shape == (2, 32, 32, 3)
    assert bool(jnp.all(jnp.isfinite(out.xhat)))


# --------------------- torchvision weight import (models/resnet.py)


def _random_resnet18_state_dict(rng, fc_out=1000):
    """Random state dict in torchvision resnet18 layout/shapes."""
    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = rng.normal(size=(o, i, k, k)).astype(
            np.float32) * 0.05

    def bn(name, c):
        sd[name + ".weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[name + ".bias"] = rng.normal(size=c).astype(np.float32) * 0.1
        sd[name + ".running_mean"] = rng.normal(size=c).astype(
            np.float32) * 0.1
        sd[name + ".running_var"] = rng.uniform(0.5, 1.5, c).astype(
            np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    widths = [64, 128, 256, 512]
    in_ch = 64
    for li, w in enumerate(widths):
        for bi in range(2):
            p = f"layer{li + 1}.{bi}"
            conv(p + ".conv1", w, in_ch, 3)
            bn(p + ".bn1", w)
            conv(p + ".conv2", w, w, 3)
            bn(p + ".bn2", w)
            if in_ch != w:
                conv(p + ".downsample.0", w, in_ch, 1)
                bn(p + ".downsample.1", w)
            in_ch = w
    sd["fc.weight"] = rng.normal(size=(fc_out, 512)).astype(np.float32)
    sd["fc.bias"] = rng.normal(size=fc_out).astype(np.float32)
    return sd


def _torch_resnet18_features(sd, x_nchw):
    """Independent torch-functional transcription of torchvision's
    resnet18 EVAL-mode feature extractor (conv1..avgpool), driven straight
    off the state dict. Validates the OIHW->HWIO mapping, the symmetric
    padding, the stride placement, and the running-stats BN all at once."""
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}

    def bnorm(name, h):
        return F.batch_norm(h, t[name + ".running_mean"],
                            t[name + ".running_var"], t[name + ".weight"],
                            t[name + ".bias"], training=False, eps=1e-5)

    h = F.conv2d(x_nchw, t["conv1.weight"], stride=2, padding=3)
    h = F.relu(bnorm("bn1", h))
    h = F.max_pool2d(h, kernel_size=3, stride=2, padding=1)
    for li in range(4):
        for bi in range(2):
            p = f"layer{li + 1}.{bi}"
            stride = 2 if (li > 0 and bi == 0) else 1
            idn = h
            o = F.conv2d(h, t[p + ".conv1.weight"], stride=stride,
                         padding=1)
            o = F.relu(bnorm(p + ".bn1", o))
            o = F.conv2d(o, t[p + ".conv2.weight"], stride=1, padding=1)
            o = bnorm(p + ".bn2", o)
            if p + ".downsample.0.weight" in t:
                idn = F.conv2d(h, t[p + ".downsample.0.weight"],
                               stride=stride)
                idn = bnorm(p + ".downsample.1", idn)
            h = F.relu(o + idn)
    return h.mean(dim=(2, 3))  # global average pool


def test_load_torch_weights_matches_torch_forward():
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(0)
    sd = _random_resnet18_state_dict(rng)
    enc = ResNetEncoder(out_dim=7, depth="resnet18", freeze_trunk=True)
    params = enc.init(jax.random.key(0))
    params = enc.load_torch_weights(params, sd)

    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    feat_torch = _torch_resnet18_features(
        sd, torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    # compare pre-fc features: run our trunk then invert the fc head
    out = np.asarray(enc(params, jnp.asarray(x)))
    w = np.asarray(params["fc"]["w"])
    b = np.asarray(params["fc"]["b"])
    expected = feat_torch @ w + b
    np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-5)


def test_load_torch_weights_keeps_fc_and_guards_shapes():
    rng = np.random.default_rng(1)
    sd = _random_resnet18_state_dict(rng)
    enc = ResNetEncoder(out_dim=24, depth="resnet18")
    params = enc.init(jax.random.key(0))
    new = enc.load_torch_weights(params, sd)
    # fc head untouched (the reference replaces it, model.py:117-125)
    np.testing.assert_array_equal(np.asarray(new["fc"]["w"]),
                                  np.asarray(params["fc"]["w"]))
    # running stats stored -> eval-mode BN
    assert "mean" in new["stem_bn"] and "var" in new["stem_bn"]
    # without running stats: batch-stats BN params only
    plain = enc.load_torch_weights(params, sd, use_running_stats=False)
    assert "mean" not in plain["stem_bn"]
    # wrong-shape import is rejected
    bad = dict(sd)
    bad["conv1.weight"] = sd["conv1.weight"][:, :2]
    with pytest.raises(ValueError, match="shape mismatch"):
        enc.load_torch_weights(params, bad)
