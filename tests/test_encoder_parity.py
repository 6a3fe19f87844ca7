"""Numerical parity of core layers vs torch (the reference's substrate).

torchvision is not installed, so parity is checked at the op level: ConvPad
(incl. reflect padding), BatchNorm train/eval, max_pool_same, the two
bilinear resizes, and the torch-weight converter round-trip through a
single conv/bn pair.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vq_seg_tpu.models.layers import (
    ConvPad,
    max_pool_same,
    resize_bilinear,
    resize_nearest,
    upsample_bilinear_ac,
)


@pytest.mark.parametrize("padding_mode", ["zeros", "reflect", "replicate"])
@pytest.mark.parametrize("stride", [1, 2])
def test_convpad_matches_torch(rng, padding_mode, stride):
    x = rng.normal(size=(2, 9, 9, 4)).astype(np.float32)
    w = rng.normal(size=(5, 4, 3, 3)).astype(np.float32) * 0.1  # OIHW
    mod = ConvPad(5, 3, stride, 1, use_bias=False, padding_mode=padding_mode)
    params = {"params": {"Conv_0": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}}}
    ours = np.asarray(mod.apply(params, jnp.asarray(x)))
    theirs = F.conv2d(
        torch.tensor(x).permute(0, 3, 1, 2),
        torch.tensor(w), stride=stride,
        padding=0 if padding_mode != "zeros" else 1,
    ) if padding_mode != "zeros" else F.conv2d(
        torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(w), stride=stride, padding=1)
    if padding_mode != "zeros":
        mode = {"reflect": "reflect", "replicate": "replicate"}[padding_mode]
        xp = F.pad(torch.tensor(x).permute(0, 3, 1, 2), (1, 1, 1, 1), mode=mode)
        theirs = F.conv2d(xp, torch.tensor(w), stride=stride)
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    assert np.allclose(ours, theirs, atol=1e-4), np.abs(ours - theirs).max()


def test_maxpool_matches_torch(rng):
    x = rng.normal(size=(1, 7, 7, 3)).astype(np.float32)
    ours = np.asarray(max_pool_same(jnp.asarray(x), 3, 2, 1))
    theirs = F.max_pool2d(torch.tensor(x).permute(0, 3, 1, 2), 3, 2, 1)
    assert np.allclose(ours, theirs.permute(0, 2, 3, 1).numpy(), atol=1e-6)


def test_maxpool_gradient_matches_torch_with_ties(rng):
    """The custom VJP (layers.py: first-match routing instead of XLA's slow
    select-and-scatter) must agree with torch even on tie-heavy post-ReLU
    inputs, where >half the entries are exactly 0."""
    x = np.maximum(rng.normal(size=(2, 9, 9, 4)), 0).astype(np.float32)
    g = rng.normal(size=(2, 5, 5, 4)).astype(np.float32)
    assert (x == 0).mean() > 0.3  # the tie regime is actually exercised

    dx = np.asarray(jax.grad(
        lambda a: (max_pool_same(a, 3, 2, 1) * jnp.asarray(g)).sum())(jnp.asarray(x)))
    xt = torch.tensor(x.transpose(0, 3, 1, 2), requires_grad=True)
    (F.max_pool2d(xt, 3, 2, 1) * torch.tensor(g.transpose(0, 3, 1, 2))).sum().backward()
    assert np.allclose(dx, xt.grad.numpy().transpose(0, 2, 3, 1), atol=1e-6)


def test_layer_impl_toggles_are_numerically_identical(rng):
    """set_layer_impl switches implementations, never numerics: both arms of
    each round-4 rewrite (max_pool backward, C<128 upsample) must agree on
    values AND gradients so the round-5 step-level A/B compares speed only."""
    from vq_seg_tpu.models.layers import _LAYER_IMPL, set_layer_impl

    x = np.maximum(rng.normal(size=(2, 9, 9, 4)), 0).astype(np.float32)
    g = rng.normal(size=(2, 5, 5, 4)).astype(np.float32)
    u = rng.normal(size=(2, 6, 5, 3)).astype(np.float32)
    saved = dict(_LAYER_IMPL)
    try:
        outs = []
        for flag in (True, False):
            set_layer_impl(max_pool_custom_vjp=flag, upsample_matmul=flag)
            y, dx = jax.value_and_grad(
                lambda a: (max_pool_same(a, 3, 2, 1) * jnp.asarray(g)).sum()
            )(jnp.asarray(x))
            up = upsample_bilinear_ac(jnp.asarray(u), size=(11, 9))
            outs.append((np.asarray(y), np.asarray(dx), np.asarray(up)))
    finally:
        set_layer_impl(**saved)
    assert np.allclose(outs[0][0], outs[1][0], atol=1e-6)
    assert np.allclose(outs[0][1], outs[1][1], atol=1e-6)
    assert np.allclose(outs[0][2], outs[1][2], atol=1e-5)


def test_upsample_ac_matmul_path_matches_gather_path(rng):
    """C<128 runs the MXU lerp-matrix path; it must match the wide-channel
    gather+lerp path on the same data (and hence torch, tested below)."""
    x = rng.normal(size=(2, 6, 5, 130)).astype(np.float32)
    wide = np.asarray(upsample_bilinear_ac(jnp.asarray(x), size=(11, 9)))
    narrow = np.asarray(upsample_bilinear_ac(jnp.asarray(x[..., :3]), size=(11, 9)))
    assert np.allclose(narrow, wide[..., :3], atol=1e-6)


def test_bilinear_resize_matches_torch(rng):
    x = rng.normal(size=(1, 5, 5, 2)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), (10, 10)))
    theirs = F.interpolate(torch.tensor(x).permute(0, 3, 1, 2), (10, 10),
                           mode="bilinear", align_corners=False)
    assert np.allclose(ours, theirs.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_upsample_align_corners_matches_torch(rng):
    x = rng.normal(size=(1, 5, 6, 2)).astype(np.float32)
    ours = np.asarray(upsample_bilinear_ac(jnp.asarray(x), scale=2))
    theirs = torch.nn.UpsamplingBilinear2d(scale_factor=2)(
        torch.tensor(x).permute(0, 3, 1, 2))
    assert np.allclose(ours, theirs.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_batchnorm_semantics(rng):
    import flax.linen as nn

    x = rng.normal(size=(4, 6, 6, 3)).astype(np.float32) * 2 + 1
    bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y, mut = bn.apply(variables, jnp.asarray(x), mutable=["batch_stats"])
    tb = torch.nn.BatchNorm2d(3, eps=1e-5, momentum=0.1)
    tb.train()
    ty = tb(torch.tensor(x).permute(0, 3, 1, 2)).detach().permute(0, 2, 3, 1).numpy()
    assert np.allclose(np.asarray(y), ty, atol=1e-4)
    # running stats after one step
    assert np.allclose(np.asarray(mut["batch_stats"]["mean"]),
                       tb.running_mean.numpy(), atol=1e-4)


def test_resnet_converter_roundtrip(rng):
    """A minimal torchvision-layout state dict converts into our tree and
    reproduces the stem conv+bn numerics."""
    from vq_seg_tpu.utils.torch_weights import convert_resnet
    from vq_seg_tpu.models.encoders import make_encoder

    enc, ch = make_encoder("resnet18", depth=2)
    x = rng.normal(size=(1, 16, 16, 3)).astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))

    # synthesise a torch-layout state dict covering the params we have
    sd = {}
    sd["conv1.weight"] = rng.normal(size=(64, 3, 7, 7)).astype(np.float32) * 0.05
    sd["bn1.weight"] = rng.normal(size=(64,)).astype(np.float32)
    sd["bn1.bias"] = rng.normal(size=(64,)).astype(np.float32)
    sd["bn1.running_mean"] = rng.normal(size=(64,)).astype(np.float32)
    sd["bn1.running_var"] = np.abs(rng.normal(size=(64,))).astype(np.float32) + 0.5
    params_new, stats_new = convert_resnet(sd)
    assert params_new["conv1"]["Conv_0"]["kernel"].shape == (7, 7, 3, 64)
    assert "bn1" in params_new and "scale" in params_new["bn1"]
    assert np.allclose(stats_new["bn1"]["mean"], sd["bn1.running_mean"])

    # splice and compare against torch conv+bn (eval mode)
    p = jax.tree_util.tree_map(lambda v: v, variables["params"])
    p = dict(p)
    p["conv1"] = params_new["conv1"]
    p["bn1"] = {**dict(variables["params"]["bn1"]),
                "scale": jnp.asarray(params_new["bn1"]["scale"]),
                "bias": jnp.asarray(params_new["bn1"]["bias"])}
    bs = dict(variables["batch_stats"])
    bs["bn1"] = {"mean": jnp.asarray(stats_new["bn1"]["mean"]),
                 "var": jnp.asarray(stats_new["bn1"]["var"])}
    feats = enc.apply({"params": p, "batch_stats": bs}, jnp.asarray(x), False)
    xt = torch.tensor(x).permute(0, 3, 1, 2)
    yt = F.conv2d(xt, torch.tensor(sd["conv1.weight"]), stride=2, padding=3)
    yt = F.batch_norm(yt, torch.tensor(sd["bn1.running_mean"]),
                      torch.tensor(sd["bn1.running_var"]),
                      torch.tensor(sd["bn1.weight"]), torch.tensor(sd["bn1.bias"]),
                      training=False, eps=1e-5)
    yt = torch.relu(yt).permute(0, 2, 3, 1).numpy()
    assert np.allclose(np.asarray(feats[1]), yt, atol=1e-4)
