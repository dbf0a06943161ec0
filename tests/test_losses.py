"""Loss semantics tests — torch (CPU) as the oracle where the reference
uses paddle equivalents, manual numpy for dice."""
import numpy as np
import jax.numpy as jnp

from medicalseg_tpu.models.losses import (BCELoss, CrossEntropyLoss,
                                          DiceLoss, MixedLoss)
from medicalseg_tpu.utils import loss_computation


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_dice_loss_manual():
    logits = _rand((2, 4, 4, 4, 3))
    labels = np.random.RandomState(1).randint(0, 3, (2, 4, 4, 4))
    loss, pcd = DiceLoss()(jnp.asarray(logits), jnp.asarray(labels))
    # manual numpy (reference dice_loss.py:45-74 semantics)
    probs = 1 / (1 + np.exp(-logits))
    onehot = np.eye(3)[labels]  # [N,D,H,W,C]
    p = probs.reshape(-1, 3).T
    t = onehot.reshape(-1, 3).T
    intersect = (p * t).sum(-1)
    denom = (p * p).sum(-1) + (t * t).sum(-1)
    pcd_ref = 2 * intersect / np.clip(denom, 1e-6, None)
    np.testing.assert_allclose(np.asarray(pcd), pcd_ref, rtol=1e-5)
    np.testing.assert_allclose(float(loss), 1 - pcd_ref.mean(), rtol=1e-5)


def test_dice_perfect_prediction():
    labels = np.random.RandomState(2).randint(0, 2, (1, 4, 4, 4))
    logits = np.where(np.eye(2)[labels] > 0, 100.0, -100.0).astype(
        np.float32)
    loss, pcd = DiceLoss()(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(pcd), [1.0, 1.0], atol=1e-5)
    assert float(loss) < 1e-5


def test_cross_entropy_vs_torch():
    import torch
    import torch.nn.functional as F
    logits = _rand((2, 3, 4, 5, 4), seed=3)  # NDHWC, C=4
    labels = np.random.RandomState(4).randint(0, 4, (2, 3, 4, 5))
    labels[0, 0, 0, :] = 255  # ignore
    weight = np.array([1.0, 2.0, 0.5, 1.5], np.float32)

    ours = CrossEntropyLoss(weight=list(weight), ignore_index=255)(
        jnp.asarray(logits), jnp.asarray(labels))
    ref = F.cross_entropy(
        torch.tensor(logits).permute(0, 4, 1, 2, 3),
        torch.tensor(labels, dtype=torch.long),
        weight=torch.tensor(weight), ignore_index=255,
        reduction="mean")
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_cross_entropy_dynamic_weight_runs():
    logits = _rand((1, 4, 4, 4, 3), seed=5)
    labels = np.random.RandomState(6).randint(0, 3, (1, 4, 4, 4))
    loss = CrossEntropyLoss()(jnp.asarray(logits), jnp.asarray(labels))
    assert np.isfinite(float(loss))


def test_bce_vs_torch():
    import torch
    import torch.nn.functional as F
    logits = _rand((2, 4, 4, 4, 1), seed=7)
    labels = (np.random.RandomState(8).rand(2, 4, 4, 4, 1) > 0.5).astype(
        np.float32)
    ours = BCELoss()(jnp.asarray(logits), jnp.asarray(labels))
    ref = F.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(labels), reduction="mean")
    # ours divides by mean(mask)=1 (+eps)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


def test_bce_dynamic():
    logits = _rand((1, 4, 4, 4, 2), seed=9)
    labels = np.random.RandomState(10).randint(0, 2, (1, 4, 4, 4))
    loss = BCELoss(weight="dynamic", pos_weight="dynamic")(
        jnp.asarray(logits), jnp.asarray(labels))
    assert np.isfinite(float(loss))


def test_mixed_loss_and_dispatcher():
    logits = _rand((2, 4, 4, 4, 3), seed=11)
    labels = np.random.RandomState(12).randint(0, 3, (2, 4, 4, 4))
    mixed = MixedLoss([CrossEntropyLoss(), DiceLoss()], [1.0, 1.0])
    losses = {"types": [mixed], "coef": [1.0]}
    loss_list, pcd = loss_computation(
        [jnp.asarray(logits)], jnp.asarray(labels), losses)
    assert len(loss_list) == 2
    assert pcd.shape == (3,)
    total = sum(float(l) for l in loss_list)
    assert np.isfinite(total)

    # 4-way deep supervision config (VNetDeepSup parity)
    losses4 = {"types": [mixed] * 4, "coef": [0.25] * 4}
    ll4, _ = loss_computation([jnp.asarray(logits)] * 4,
                              jnp.asarray(labels), losses4)
    assert len(ll4) == 8


def test_dice_ignore_index_masks_all_sums():
    """Voxels labelled ignore_index must drop out of intersect, sum(p^2),
    and the label count (round-2 fix; the reference never masks)."""
    logits = _rand((1, 4, 4, 4, 2), seed=3)
    labels = np.random.RandomState(4).randint(0, 2, (1, 4, 4, 4))
    ignored = np.random.RandomState(5).rand(1, 4, 4, 4) < 0.3
    labels_ig = np.where(ignored, 255, labels)

    loss, pcd = DiceLoss(ignore_index=255)(jnp.asarray(logits),
                                           jnp.asarray(labels_ig))
    # manual: restrict every sum to valid voxels
    probs = 1 / (1 + np.exp(-logits))
    valid = ~ignored
    p = probs[valid[..., None].repeat(2, -1)].reshape(-1, 2).T
    t = np.eye(2)[labels[valid]].T
    intersect = (p * t).sum(-1)
    denom = (p * p).sum(-1) + t.sum(-1)
    pcd_ref = 2 * intersect / np.clip(denom, 1e-6, None)
    np.testing.assert_allclose(np.asarray(pcd), pcd_ref, rtol=1e-5)
    np.testing.assert_allclose(float(loss), 1 - pcd_ref.mean(), rtol=1e-5)

    # and with no ignored voxels present, masking is a no-op
    loss_a, pcd_a = DiceLoss(ignore_index=255)(jnp.asarray(logits),
                                               jnp.asarray(labels))
    loss_b, pcd_b = DiceLoss(ignore_index=7)(jnp.asarray(logits),
                                             jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(pcd_a), np.asarray(pcd_b),
                               rtol=1e-6)


def test_fused_masks_matches_loop_values_and_grads(monkeypatch):
    """The iota-compare fused formulation (MEDSEG_LOSS_FUSED=1) is
    bit-for-bit the same math as the per-class loop — values AND
    gradients, with ignore_index voxels present and dynamic CE
    weights."""
    import jax

    logits = _rand((2, 3, 4, 4, 5), seed=11)
    labels = np.random.RandomState(12).randint(0, 5, (2, 3, 4, 4))
    labels = np.where(np.random.RandomState(13).rand(*labels.shape) < 0.2,
                      255, labels)
    lg, lb = jnp.asarray(logits), jnp.asarray(labels)

    def total(lg, lb):
        ce = CrossEntropyLoss()(lg, lb)
        dl, _ = DiceLoss(ignore_index=255)(lg, lb)
        return ce + dl

    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("MEDSEG_LOSS_FUSED", flag)
        outs[flag] = (float(total(lg, lb)),
                      np.asarray(jax.grad(total)(lg, lb)))
    np.testing.assert_allclose(outs["0"][0], outs["1"][0], rtol=1e-6)
    np.testing.assert_allclose(outs["0"][1], outs["1"][1], rtol=1e-5,
                               atol=1e-7)
