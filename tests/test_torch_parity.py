"""Numerical parity against torch transcriptions of the reference math.

These tests re-state the reference's documented formulas in torch (cdist/
argmin VQ assignment, vq_img.py:160-177; STE + commitment :236-240;
ReliablePrototypeLossv2's multiplicative-margin CE, prototype.py:844-868)
and check our jnp implementations reproduce them on random inputs.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F


@pytest.fixture
def vq_inputs(rng):
    x = rng.normal(size=(200, 32)).astype(np.float32)
    cb = rng.normal(size=(16, 32)).astype(np.float32)
    return x, cb


def test_vq_assignment_matches_torch_cdist(vq_inputs):
    from vq_seg_tpu.ops.vq import vq_assign_xla

    x, cb = vq_inputs
    idx, quant, counts = vq_assign_xla(jnp.asarray(x), jnp.asarray(cb))
    d = torch.cdist(torch.tensor(x), torch.tensor(cb), p=2)
    t_idx = torch.argmin(d, dim=-1)
    assert np.array_equal(np.asarray(idx), t_idx.numpy())
    assert np.allclose(np.asarray(quant), cb[t_idx.numpy()])
    t_counts = torch.bincount(t_idx, minlength=16)
    assert np.array_equal(np.asarray(counts), t_counts.numpy())


def test_vq_cosine_assignment_matches_torch(vq_inputs):
    from vq_seg_tpu.ops.kmeans import l2norm
    from vq_seg_tpu.ops.vq import vq_assign_xla

    x, cb = vq_inputs
    xn = np.asarray(l2norm(jnp.asarray(x)))
    cbn = np.asarray(l2norm(jnp.asarray(cb)))
    idx, _, _ = vq_assign_xla(jnp.asarray(xn), jnp.asarray(cbn), metric="cosine")
    sims = torch.einsum("nd,ed->ne", torch.tensor(xn), torch.tensor(cbn))
    assert np.array_equal(np.asarray(idx), torch.argmax(sims, dim=-1).numpy())


def test_ste_and_commitment_match_torch(vq_inputs):
    from vq_seg_tpu.ops.vq import commitment_loss, quantize_ste

    x, cb = vq_inputs
    q = cb[np.random.default_rng(0).integers(0, 16, size=200)]
    xt = torch.tensor(x, requires_grad=True)
    qt = torch.tensor(q)
    ste_t = xt + (qt - xt).detach()
    commit_t = F.mse_loss(ste_t.detach(), xt)
    (commit_t * 1.0).backward()

    xj = jnp.asarray(x)
    ste_j = quantize_ste(xj, jnp.asarray(q))
    assert np.allclose(np.asarray(ste_j), ste_t.detach().numpy(), atol=1e-6)
    commit_j, grad_j = jax.value_and_grad(
        lambda xx: commitment_loss(xx, quantize_ste(xx, jnp.asarray(q))))(xj)
    assert abs(float(commit_j) - float(commit_t)) < 1e-6
    assert np.allclose(np.asarray(grad_j), xt.grad.numpy(), atol=1e-6)


def _torch_reliable_v2(x, gt, weight, margin, scale, th=None, score=None):
    """Torch transcription of ReliablePrototypeLossv2.forward
    (prototype.py:810-874) with fixed (already-initialised) prototypes."""
    x = torch.tensor(x)            # (N, C, H, W) torch layout
    w = torch.tensor(weight)
    confidence_mask = None
    if score is not None:
        pred = torch.tensor(score)
        flat_pred = pred.permute(0, 2, 3, 1).reshape(-1, pred.shape[1])
        prob = torch.softmax(flat_pred, dim=-1)
        confidence_mask = (prob.max(dim=1)[0] > th).to(pred.dtype)
        gt = torch.argmax(pred, dim=1)
    else:
        gt = torch.tensor(gt)
    flat_x = x.permute(0, 2, 3, 1).reshape(-1, x.shape[1])
    flat_gt = gt.reshape(-1)
    wn = F.normalize(w, p=2, dim=-1)
    fx = F.normalize(flat_x, p=2, dim=-1)
    cosine = F.linear(fx, wn)
    cos_m, sin_m = math.cos(margin), math.sin(margin)
    sine = torch.sqrt((1.0 - cosine**2).clamp(0, 1))
    phi = cosine * cos_m - sine * sin_m
    phi = torch.where(cosine > 0, phi, cosine)
    ind = torch.arange(cosine.shape[0])
    cosine[ind, flat_gt] = cosine[ind, flat_gt] * phi[ind, flat_gt]
    cosine = scale * cosine
    positive = torch.exp(cosine[ind, flat_gt])
    sum_all = torch.sum(torch.exp(cosine), dim=-1)
    lg = torch.log(positive / (sum_all + 1e-7) + 1e-7)
    if confidence_mask is not None:
        lg = lg * confidence_mask
    return float(-torch.mean(lg))


def test_reliable_v2_matches_torch_int_labels(rng):
    from vq_seg_tpu.models.modules.prototype import ReliablePrototypeLossv2

    x = rng.normal(size=(2, 6, 6, 8)).astype(np.float32)
    gt = rng.integers(0, 3, size=(2, 6, 6)).astype(np.int64)
    mod = ReliablePrototypeLossv2(num_classes=3, embedding_dim=8, pt_init="normal",
                                  margin=0.5, scale=30.0)
    variables = mod.init({"params": jax.random.PRNGKey(0)},
                         jnp.asarray(x), jnp.asarray(gt), 0.7)
    w = np.asarray(variables["params"]["embedding"])
    ours = float(mod.apply(variables, jnp.asarray(x), jnp.asarray(gt), 0.7))
    theirs = _torch_reliable_v2(x.transpose(0, 3, 1, 2), gt, w, 0.5, 30.0)
    assert abs(ours - theirs) / abs(theirs) < 1e-4, (ours, theirs)


def test_reliable_v2_matches_torch_score_map(rng):
    from vq_seg_tpu.models.modules.prototype import ReliablePrototypeLossv2

    x = rng.normal(size=(2, 6, 6, 8)).astype(np.float32)
    score = rng.normal(size=(2, 6, 6, 3)).astype(np.float32) * 3
    mod = ReliablePrototypeLossv2(num_classes=3, embedding_dim=8, pt_init="normal",
                                  margin=0.5, scale=30.0)
    variables = mod.init({"params": jax.random.PRNGKey(0)},
                         jnp.asarray(x), jnp.asarray(score), 0.5)
    w = np.asarray(variables["params"]["embedding"])
    ours = float(mod.apply(variables, jnp.asarray(x), jnp.asarray(score), 0.5))
    theirs = _torch_reliable_v2(x.transpose(0, 3, 1, 2), None, w, 0.5, 30.0,
                                th=0.5, score=score.transpose(0, 3, 1, 2))
    assert abs(ours - theirs) / max(abs(theirs), 1e-6) < 1e-3, (ours, theirs)


def test_kmeans_converges_like_torch_formulation(rng):
    """k-means zero-bin protection: empty clusters keep their previous mean
    (vq_img.py:52-61)."""
    from vq_seg_tpu.ops.kmeans import kmeans

    # two tight, far-apart blobs; ask for 4 clusters -> at least 2 stay put
    a = rng.normal(size=(50, 4)).astype(np.float32) * 0.01
    b = rng.normal(size=(50, 4)).astype(np.float32) * 0.01 + 100.0
    x = jnp.asarray(np.concatenate([a, b]))
    means, bins = kmeans(jax.random.PRNGKey(0), x, 4, 10)
    assert np.isfinite(np.asarray(means)).all()
    # cluster means live near one of the blobs
    m = np.asarray(means)
    near = np.minimum(np.abs(m).max(1), np.abs(m - 100.0).max(1))
    assert (near < 1.0).all()
