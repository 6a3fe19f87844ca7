"""Numerical parity against the REFERENCE'S OWN modules, executing.

Unlike tests/test_torch_parity.py (which pins against torch transcriptions
re-written by this repo's author — a transcription cannot catch a shared
misreading), these tests import `/root/reference`'s actual torch code and
run it as the oracle:

  * vector_quantizer/vq_img.py  — kmeans, EuclideanCodebook,
    CosinesimCodebook, VectorQuantizer (STE + commitment)
  * loss/{dice,focal,contrastive,dc}_loss.py + loss/__init__.py factory
  * measurement.py              — Measurement (conf-mat/miou/P/R/F1/acc)
  * models/modules/prototype.py — ReliablePrototypeLossv2 (flagship)

torchvision is absent in this image, so `models/__init__.py` (which pulls
the encoder zoo) cannot be imported; `models.modules.prototype` is loaded
through a stub `models` package whose __path__ points at the reference tree,
skipping the package __init__.  Everything else imports clean with
/root/reference on sys.path.
"""
import importlib
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

REF = "/root/reference"

_REF_MODULES = [
    "utils", "utils.seg_tools", "loss", "loss.dice_loss", "loss.focal_loss",
    "loss.contrastive_loss", "loss.dc_loss", "measurement",
    "vector_quantizer", "vector_quantizer.vq_img",
    "models", "models.modules", "models.modules.prototype",
]


class _EasyDict(dict):
    """Stub for the absent `easydict` dependency: dict with attribute access
    (the only behavior the reference's imports use)."""

    def __init__(self, d=None, **kw):
        super().__init__()
        for k, v in {**(d or {}), **kw}.items():
            self[k] = _EasyDict(v) if isinstance(v, dict) else v
            setattr(self, k, self[k])


@pytest.fixture(scope="module")
def ref():
    """Import the reference modules from /root/reference, executing them."""
    saved = {m: sys.modules.pop(m) for m in _REF_MODULES if m in sys.modules}
    sys.path.insert(0, REF)
    had_easydict = "easydict" in sys.modules
    if not had_easydict:
        ed = types.ModuleType("easydict")
        ed.EasyDict = _EasyDict
        sys.modules["easydict"] = ed
    try:
        ns = types.SimpleNamespace()
        ns.vq_img = importlib.import_module("vector_quantizer.vq_img")
        ns.dice = importlib.import_module("loss.dice_loss")
        ns.focal = importlib.import_module("loss.focal_loss")
        ns.contrastive = importlib.import_module("loss.contrastive_loss")
        ns.dc = importlib.import_module("loss.dc_loss")
        ns.loss_factory = importlib.import_module("loss")
        ns.measurement = importlib.import_module("measurement")
        # models/__init__.py imports the torchvision-backed encoder zoo;
        # mount a stub package so models.modules.prototype loads standalone.
        stub = types.ModuleType("models")
        stub.__path__ = [f"{REF}/models"]
        sys.modules["models"] = stub
        ns.prototype = importlib.import_module("models.modules.prototype")
        yield ns
    finally:
        sys.path.remove(REF)
        for m in _REF_MODULES:
            sys.modules.pop(m, None)
        if not had_easydict:
            sys.modules.pop("easydict", None)
        sys.modules.update(saved)


@pytest.fixture
def nprng():
    return np.random.default_rng(7)


# ---------------------------------------------------------------- kmeans


@pytest.mark.parametrize("use_cosine", [False, True], ids=["euclidean", "cosine"])
def test_kmeans_iterations_match_reference(ref, nprng, monkeypatch, use_cosine):
    """Pin ops/kmeans.py's update loop against the reference's kmeans
    (vq_img.py:29-63) EXECUTING, from identical initial means.

    Both sides draw their initial means with their own RNG, so the
    reference's sampler is monkeypatched to start from the means OUR
    sampler picked — after that, 6 Lloyd iterations (zero-bin keep-old,
    cosine renorm) must agree."""
    from vq_seg_tpu.ops.kmeans import kmeans, l2norm, sample_vectors

    x = nprng.normal(size=(256, 16)).astype(np.float32)
    if use_cosine:
        x = np.asarray(l2norm(jnp.asarray(x)))
    k, iters = 8, 6
    key = jax.random.PRNGKey(3)

    init = np.asarray(sample_vectors(key, jnp.asarray(x), k))  # our init
    monkeypatch.setattr(
        ref.vq_img, "batched_sample_vectors",
        lambda samples, num: torch.tensor(init)[None],
    )
    t_means, t_bins = ref.vq_img.kmeans(
        torch.tensor(x), k, iters, use_cosine_sim=use_cosine)

    j_means, j_bins = kmeans(key, jnp.asarray(x), k, iters,
                             use_cosine_sim=use_cosine)
    np.testing.assert_array_equal(np.asarray(j_bins), t_bins[0].numpy())
    np.testing.assert_allclose(np.asarray(j_means), t_means[0].numpy(),
                               atol=2e-5, rtol=1e-5)


# ------------------------------------------------- VectorQuantizer module


@pytest.mark.parametrize("distance", ["euclidean", "cosine"])
def test_vector_quantizer_forward_matches_reference(ref, nprng, distance):
    """Full module parity vs vq_img.py:189-244 executing: quantized map,
    indices, code_usage, and (train mode) the STE + commitment loss."""
    from vq_seg_tpu.models.modules.vector_quantizer import VectorQuantizer

    b, c, h, w, k = 2, 16, 8, 8, 12
    x = nprng.normal(size=(b, c, h, w)).astype(np.float32)
    cb = nprng.normal(size=(k, c)).astype(np.float32)

    t_vq = ref.vq_img.VectorQuantizer(
        dim=c, num_embeddings=k, kmeans_init=False, distance=distance)
    with torch.no_grad():
        t_vq.codebook.embedding.weight.copy_(torch.tensor(cb))

    j_vq = VectorQuantizer(dim=c, num_embeddings=k, distance=distance)
    variables = {"codebook": {"embedding": jnp.asarray(cb)}}
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))

    # eval mode: raw quantized vectors, no loss
    t_vq.eval()
    with torch.no_grad():
        t_q, t_idx, t_loss, t_usage = t_vq(torch.tensor(x))
    j_q, j_idx, j_loss, j_usage = j_vq.apply(variables, x_nhwc, train=False)
    np.testing.assert_array_equal(np.asarray(j_idx), t_idx.numpy())
    np.testing.assert_allclose(
        np.asarray(j_q), t_q.permute(0, 2, 3, 1).numpy(), atol=1e-6)
    assert abs(float(j_usage) - float(t_usage)) < 1e-6
    assert float(j_loss) == 0.0 and float(t_loss) == 0.0

    # train mode: STE passthrough value + commitment loss + its gradient
    t_vq.train()
    xt = torch.tensor(x, requires_grad=True)
    t_q, t_idx, t_loss, _ = t_vq(xt)
    t_loss.backward(torch.ones_like(t_loss))

    def j_fwd(xx):
        q, idx, loss, usage = j_vq.apply(variables, xx, train=True)
        return loss, (q, idx)

    (j_loss, (j_q, j_idx)), j_grad = jax.value_and_grad(
        j_fwd, has_aux=True)(x_nhwc)
    np.testing.assert_array_equal(np.asarray(j_idx), t_idx.numpy())
    np.testing.assert_allclose(
        np.asarray(j_q), t_q.detach().permute(0, 2, 3, 1).numpy(), atol=1e-6)
    np.testing.assert_allclose(float(j_loss), float(t_loss.detach()), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(j_grad), xt.grad.permute(0, 2, 3, 1).numpy(), atol=1e-6)


# ----------------------------------------------------------------- losses


@pytest.mark.parametrize("weighted", [False, True], ids=["plain", "weighted"])
def test_dice_loss_matches_reference(ref, nprng, weighted):
    """loss/dice_loss.py:5-58 executing (incl. the zeroed-logit ignore quirk)."""
    from vq_seg_tpu.losses.dice import dice_loss

    pred = nprng.normal(size=(4, 3, 10, 10)).astype(np.float32)
    target = nprng.integers(0, 3, size=(4, 10, 10))
    target[0, :2, :2] = 255  # exercises the ignore path
    weight = np.asarray([0.2, 0.5, 0.3], np.float32) if weighted else None

    t = ref.dice.dice_loss(
        torch.tensor(pred), torch.tensor(target), 3,
        weight=None if weight is None else torch.tensor(weight),
        ignore_index=255)
    j = dice_loss(jnp.asarray(np.transpose(pred, (0, 2, 3, 1))),
                  jnp.asarray(target), 3, weight=weight, ignore_index=255)
    np.testing.assert_allclose(float(j), float(t), rtol=1e-5)


@pytest.mark.parametrize("reduction", ["sum", "mean", "none"])
def test_focal_loss_matches_reference(ref, nprng, reduction):
    """loss/focal_loss.py:6-50 executing, all reductions + class weight."""
    from vq_seg_tpu.losses.focal import focal_loss

    pred = nprng.normal(size=(3, 3, 9, 9)).astype(np.float32)
    target = nprng.integers(0, 3, size=(3, 9, 9))
    target[1, :3, :] = 255
    weight = np.asarray([1.0, 2.0, 0.5], np.float32)

    t = ref.focal.focal_loss(
        torch.tensor(pred), torch.tensor(target), 0.25, 2.0, num_classes=3,
        ignore_index=255, reduction=reduction, weight=torch.tensor(weight))
    j = focal_loss(jnp.asarray(np.transpose(pred, (0, 2, 3, 1))),
                   jnp.asarray(target), alpha=0.25, gamma=2.0, num_classes=3,
                   ignore_index=255, reduction=reduction, weight=weight)
    if reduction == "none":
        np.testing.assert_allclose(np.asarray(j), t.numpy(), atol=1e-5)
    else:
        np.testing.assert_allclose(float(j), float(t), rtol=1e-4)


def test_focal_loss_class_double_softmax_matches_reference(ref, nprng):
    """The reference FocalLoss.forward softmaxes BEFORE calling focal_loss,
    which softmaxes again (focal_loss.py:63-68 + :20) — pin the quirk."""
    from vq_seg_tpu.losses import make_loss

    pred = nprng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    target = nprng.integers(0, 3, size=(2, 8, 8))

    t_loss = ref.loss_factory.make_loss("focal_loss", 3, ignore_index=255)
    t = t_loss(torch.tensor(pred), torch.tensor(target))
    j_loss = make_loss("focal_loss", 3, ignore_index=255)
    j = j_loss(jnp.asarray(np.transpose(pred, (0, 2, 3, 1))), jnp.asarray(target))
    np.testing.assert_allclose(float(j), float(t), rtol=1e-5)


def test_supcon_loss_matches_reference(ref, nprng):
    """loss/contrastive_loss.py:9-30 executing.  Features are scaled small
    so the reference's raw exp(sim/T) (no max-subtraction) stays finite."""
    from vq_seg_tpu.losses.contrastive import supcon_loss

    x = (0.05 * nprng.normal(size=(3, 8, 6, 6))).astype(np.float32)
    label = nprng.integers(0, 3, size=(3, 6, 6))

    t_mod = ref.contrastive.SupConLoss(temperature=0.04)
    t = t_mod(torch.tensor(x), torch.tensor(label))
    j = supcon_loss(jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                    jnp.asarray(label), temperature=0.04)
    np.testing.assert_allclose(float(j), float(t), rtol=1e-4)


def test_dc_loss_matches_reference(ref, nprng):
    from vq_seg_tpu.losses.dc import dc_loss

    phi1 = nprng.normal(size=(6, 32)).astype(np.float32)
    phi2 = nprng.normal(size=(6, 32)).astype(np.float32)
    t = ref.dc.dcloss(torch.tensor(phi1), torch.tensor(phi2))
    j = dc_loss(jnp.asarray(phi1), jnp.asarray(phi2))
    np.testing.assert_allclose(float(j), float(t), rtol=1e-5)


def test_compute_class_weight_matches_reference(ref, nprng):
    from vq_seg_tpu.losses import compute_class_weight

    y = nprng.integers(0, 3, size=(4, 12, 12))
    t = ref.loss_factory.compute_class_weight(3, torch.tensor(y))
    j = compute_class_weight(3, jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(j), t.numpy(), atol=1e-6)


def test_cross_entropy_factory_matches_reference(ref, nprng):
    """loss/__init__.py make_loss('cross_entropy') — torch CE semantics
    (mean over non-ignored, weighted) vs our _CE."""
    from vq_seg_tpu.losses import make_loss

    pred = nprng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    target = nprng.integers(0, 3, size=(2, 8, 8))
    target[0, 0, :4] = 255
    weight = np.asarray([1.0, 2.0, 0.5], np.float32)

    t_loss = ref.loss_factory.make_loss("cross_entropy", 3, ignore_index=255,
                                        weight=torch.tensor(weight))
    t = t_loss(torch.tensor(pred), torch.tensor(target).long())
    j_loss = make_loss("cross_entropy", 3, ignore_index=255, weight=weight)
    j = j_loss(jnp.asarray(np.transpose(pred, (0, 2, 3, 1))), jnp.asarray(target))
    np.testing.assert_allclose(float(j), float(t), rtol=1e-5)


# ------------------------------------------------------------- Measurement


def test_measurement_matches_reference(ref, nprng):
    """measurement.py:7-100 executing: acc, miou, iou_list, P, R, F1."""
    from vq_seg_tpu.metrics.measurement import Measurement

    pred = nprng.normal(size=(4, 3, 12, 12)).astype(np.float32)
    target = nprng.integers(0, 3, size=(4, 12, 12))

    t_m = ref.measurement.Measurement(3)
    t_acc, t_miou, t_ious, t_p, t_r, t_f1 = t_m.measure(pred, target)
    j_m = Measurement(3, channel_axis=1)
    j_acc, j_miou, j_ious, j_p, j_r, j_f1 = j_m.measure(pred, target)

    np.testing.assert_allclose(j_acc, t_acc, rtol=1e-5)
    np.testing.assert_allclose(j_miou, t_miou, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(j_ious), np.asarray(t_ious), rtol=1e-5)
    np.testing.assert_allclose(j_p, t_p, rtol=1e-5)
    np.testing.assert_allclose(j_r, t_r, rtol=1e-5)
    np.testing.assert_allclose(j_f1, t_f1, rtol=1e-5)


def test_measurement_accuracy_ignore_idx_matches_reference(ref, nprng):
    from vq_seg_tpu.metrics.measurement import Measurement

    pred = nprng.normal(size=(2, 3, 10, 10)).astype(np.float32)
    target = nprng.integers(0, 3, size=(2, 10, 10))
    target[:, :3, :3] = 255
    t = ref.measurement.Measurement(3, ignore_idx=255).accuracy(pred, target)
    j = Measurement(3, ignore_idx=255, channel_axis=1).accuracy(pred, target)
    np.testing.assert_allclose(j, t, rtol=1e-5)


# --------------------------------------------- ReliablePrototypeLossv2


def _ref_proto_v2(ref, w, scale, margin, orth=0.0):
    mod = ref.prototype.ReliablePrototypeLossv2(
        num_classes=w.shape[0], embedding_dim=w.shape[1], scale=scale,
        margin=margin, init="normal", orthogonal_reg_weight=orth)
    with torch.no_grad():
        mod.embedding.weight.copy_(torch.tensor(w))
    mod.train()
    return mod


@pytest.mark.parametrize("orth", [0.0, 0.1], ids=["plain", "orthreg"])
def test_reliable_prototype_v2_int_gt_matches_reference(ref, nprng, orth):
    """prototype.py:778-874 executing, hard-label path (+ orthogonal reg)."""
    from vq_seg_tpu.models.modules.prototype import ReliablePrototypeLossv2

    n, c, h, w_ = 2, 16, 8, 8
    x = nprng.normal(size=(n, c, h, w_)).astype(np.float32)
    gt = nprng.integers(0, 3, size=(n, h, w_))
    w = nprng.normal(size=(3, c)).astype(np.float32)

    t_mod = _ref_proto_v2(ref, w, scale=4.0, margin=0.5, orth=orth)
    t = t_mod(torch.tensor(x), torch.tensor(gt), th=None)

    j_mod = ReliablePrototypeLossv2(
        num_classes=3, embedding_dim=c, pt_init="normal", scale=4.0,
        margin=0.5, orthogonal_reg_weight=orth)
    j = j_mod.apply({"params": {"embedding": jnp.asarray(w)}},
                    jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                    jnp.asarray(gt), train=True)
    np.testing.assert_allclose(float(j), float(t), rtol=1e-4)


def test_reliable_prototype_v2_scoremap_matches_reference(ref, nprng):
    """The confidence-masked pseudo-label path (prototype.py:811-821):
    gt is a same-size score map, mask = max softmax prob > th."""
    from vq_seg_tpu.models.modules.prototype import ReliablePrototypeLossv2

    n, c, h, w_ = 2, 16, 8, 8
    x = nprng.normal(size=(n, c, h, w_)).astype(np.float32)
    score = (2.0 * nprng.normal(size=(n, 3, h, w_))).astype(np.float32)
    w = nprng.normal(size=(3, c)).astype(np.float32)

    t_mod = _ref_proto_v2(ref, w, scale=4.0, margin=0.5)
    t = t_mod(torch.tensor(x), torch.tensor(score), th=0.6)

    j_mod = ReliablePrototypeLossv2(
        num_classes=3, embedding_dim=c, pt_init="normal", scale=4.0, margin=0.5)
    j = j_mod.apply({"params": {"embedding": jnp.asarray(w)}},
                    jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                    jnp.asarray(np.transpose(score, (0, 2, 3, 1))),
                    th=0.6, train=True)
    np.testing.assert_allclose(float(j), float(t), rtol=1e-4)
