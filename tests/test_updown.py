"""Space-to-depth up/down-sampling convs (ops/updown.py).

The V-Net transitions' window==stride VALID convs (reference
medicalseg/models/vnet.py:82-113, 116-156) reformulated as single MXU
matmuls must match the stock XLA convs exactly: same params, same
outputs, same gradients.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from medicalseg_tpu.models import VNet
from medicalseg_tpu.ops.updown import conv_s2d, conv_transpose_d2s

KERNELS = [(2, 2, 2), (2, 2, 1), (1, 2, 2), (3, 2, 2)]


@pytest.mark.parametrize("k", KERNELS)
def test_conv_s2d_matches_xla(k):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 12, 16).astype(np.float32))
    K = jnp.asarray(rng.randn(*k, 16, 32).astype(np.float32))
    b = jnp.asarray(rng.randn(32).astype(np.float32))
    ref = lax.conv_general_dilated(
        x, K, k, "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
    np.testing.assert_allclose(np.asarray(conv_s2d(x, K, b)),
                               np.asarray(ref), atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("k", KERNELS)
def test_conv_transpose_d2s_matches_xla(k):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 4, 4, 6, 32).astype(np.float32))
    K = jnp.asarray(rng.randn(*k, 32, 16).astype(np.float32))
    b = jnp.asarray(rng.randn(16).astype(np.float32))
    ref = lax.conv_transpose(
        x, K, k, "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
    np.testing.assert_allclose(np.asarray(conv_transpose_d2s(x, K, b)),
                               np.asarray(ref), atol=1e-4, rtol=1e-5)


def test_conv_s2d_ragged_valid_tail():
    """VALID drops the ragged tail; the s2d slice must agree."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 7, 9, 5, 4).astype(np.float32))
    K = jnp.asarray(rng.randn(2, 2, 2, 4, 8).astype(np.float32))
    ref = lax.conv_general_dilated(
        x, K, (2, 2, 2), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = conv_s2d(x, K)
    assert got.shape == ref.shape == (1, 3, 4, 2, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)


def test_updown_gradients_match_xla():
    """VJPs of the matmul form agree with the conv VJPs (dgrad + wgrad)."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 8, 8, 8, 8).astype(np.float32))
    K = jnp.asarray(rng.randn(2, 2, 2, 8, 16).astype(np.float32))

    def f_ref(x, K):
        return jnp.sum(jnp.sin(lax.conv_general_dilated(
            x, K, (2, 2, 2), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))))

    def f_s2d(x, K):
        return jnp.sum(jnp.sin(conv_s2d(x, K)))

    gx_r, gk_r = jax.grad(f_ref, argnums=(0, 1))(x, K)
    gx_s, gk_s = jax.grad(f_s2d, argnums=(0, 1))(x, K)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_r),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_s), np.asarray(gk_r),
                               atol=1e-4, rtol=1e-4)


def test_vnet_s2d_matches_default():
    """VNet(updown_conv='s2d') consumes the default param tree unchanged
    and reproduces the default logits — checkpoints interchange."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(1, 16, 16, 16, 1).astype(np.float32))
    base = VNet(num_classes=3, dropout=False)
    s2d = VNet(num_classes=3, dropout=False, updown_conv="s2d")
    variables = jax.jit(
        lambda k, a: base.init(k, a, train=False))(jax.random.PRNGKey(0), x)
    out_b = jax.jit(
        lambda v, a: base.apply(v, a, train=False))(variables, x)[0]
    out_s = jax.jit(
        lambda v, a: s2d.apply(v, a, train=False))(variables, x)[0]
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_b),
                               atol=2e-4, rtol=1e-4)


def test_vnet_s2d_anisotropic_falls_back():
    """Stages whose kernel != stride (the spine geometry) keep the XLA
    conv under the same param names; mixed eligibility still runs."""
    ks = [[2, 2, 4], [2, 2, 2], [2, 2, 2], [2, 2, 2]]
    ss = [[2, 2, 1], [2, 2, 1], [2, 2, 2], [2, 2, 2]]
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(1, 16, 16, 12, 1).astype(np.float32))
    base = VNet(num_classes=2, dropout=False, kernel_size=ks,
                stride_size=ss)
    s2d = VNet(num_classes=2, dropout=False, kernel_size=ks,
               stride_size=ss, updown_conv="s2d")
    variables = jax.jit(
        lambda k, a: base.init(k, a, train=False))(jax.random.PRNGKey(1), x)
    out_b = jax.jit(
        lambda v, a: base.apply(v, a, train=False))(variables, x)[0]
    out_s = jax.jit(
        lambda v, a: s2d.apply(v, a, train=False))(variables, x)[0]
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_b),
                               atol=2e-4, rtol=1e-4)


Z_CASES = [((4, 2, 2), (1, 2, 2)), ((2, 2, 2), (1, 2, 2)),
           ((3, 2, 2), (2, 2, 2)), ((4, 1, 2), (1, 1, 2))]


@pytest.mark.parametrize("k,s", Z_CASES)
def test_conv_s2d_z_matches_xla(k, s):
    """Overlapping-z down conv (the anisotropic spine stages, kernel
    (4,2,2) stride (1,2,2)) as per-tap MXU matmuls == XLA conv.

    Kept correct + tested, but NOT routed by default any more:
    supports_s2d is k == s only (round-5 spine A/B — the XLA
    conv emitters beat the z-overlap matmul forms, see updown.py)."""
    from medicalseg_tpu.ops.updown import conv_s2d_z, supports_s2d
    assert not supports_s2d(k, s)
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(2, 9, 8, 12, 16).astype(np.float32))
    K = jnp.asarray(rng.randn(*k, 16, 32).astype(np.float32))
    b = jnp.asarray(rng.randn(32).astype(np.float32))
    ref = lax.conv_general_dilated(
        x, K, s, "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
    got = conv_s2d_z(x, K, s[0], b)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("k", [(4, 2, 2), (2, 2, 2), (3, 1, 2)])
def test_conv_transpose_d2s_z_matches_xla(k):
    """Overlapping-z transposed conv (z stride 1) == lax.conv_transpose."""
    from medicalseg_tpu.ops.updown import conv_transpose_d2s_z
    s = (1, k[1], k[2])
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 5, 4, 6, 32).astype(np.float32))
    K = jnp.asarray(rng.randn(*k, 32, 16).astype(np.float32))
    b = jnp.asarray(rng.randn(16).astype(np.float32))
    ref = lax.conv_transpose(
        x, K, s, "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
    got = conv_transpose_d2s_z(x, K, b)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)


def test_updown_z_gradients_match_xla():
    from medicalseg_tpu.ops.updown import (conv_s2d_z,
                                           conv_transpose_d2s_z)
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(1, 8, 4, 4, 8).astype(np.float32))
    K = jnp.asarray(rng.randn(4, 2, 2, 8, 16).astype(np.float32))

    def loss_new(x, K):
        return jnp.sum(conv_s2d_z(x, K, 1) ** 2)

    def loss_ref(x, K):
        y = lax.conv_general_dilated(
            x, K, (1, 2, 2), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return jnp.sum(y ** 2)

    gx_n, gk_n = jax.grad(loss_new, (0, 1))(x, K)
    gx_r, gk_r = jax.grad(loss_ref, (0, 1))(x, K)
    np.testing.assert_allclose(np.asarray(gx_n), np.asarray(gx_r),
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_n), np.asarray(gk_r),
                               atol=1e-3, rtol=1e-4)

    xt = jnp.asarray(rng.randn(1, 5, 4, 4, 16).astype(np.float32))

    def loss_tn(x, K):
        return jnp.sum(conv_transpose_d2s_z(x, K) ** 2)

    def loss_tr(x, K):
        y = lax.conv_transpose(
            x, K, (1, 2, 2), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return jnp.sum(y ** 2)

    Kt = jnp.asarray(rng.randn(4, 2, 2, 16, 8).astype(np.float32))
    gx_n, gk_n = jax.grad(loss_tn, (0, 1))(xt, Kt)
    gx_r, gk_r = jax.grad(loss_tr, (0, 1))(xt, Kt)
    np.testing.assert_allclose(np.asarray(gx_n), np.asarray(gx_r),
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_n), np.asarray(gk_r),
                               atol=1e-3, rtol=1e-4)


def test_vnet_s2d_spine_geometry_matches_default():
    """The FLAGSHIP spine geometry (kernel [[4,2,2],...], stride
    [[1,2,2],...] — z-overlapping): updown_conv='s2d' must reproduce
    the default-conv logits from the same param tree whichever route
    each stage takes (z-overlap stages fall back to the XLA convs
    since round 5; k == s stages use the matmul form)."""
    ks = [[4, 2, 2], [2, 2, 2], [2, 2, 2], [2, 2, 2]]
    ss = [[1, 2, 2], [1, 2, 2], [2, 2, 2], [2, 2, 2]]
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.rand(1, 12, 16, 16, 1).astype(np.float32))
    base = VNet(num_classes=2, dropout=False, kernel_size=ks,
                stride_size=ss, updown_conv="default")
    s2d = VNet(num_classes=2, dropout=False, kernel_size=ks,
               stride_size=ss, updown_conv="s2d")
    variables = jax.jit(
        lambda k, a: base.init(k, a, train=False))(jax.random.PRNGKey(2), x)
    out_b = jax.jit(
        lambda v, a: base.apply(v, a, train=False))(variables, x)[0]
    out_s = jax.jit(
        lambda v, a: s2d.apply(v, a, train=False))(variables, x)[0]
    assert out_s.shape == out_b.shape
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_b),
                               atol=2e-4, rtol=1e-4)


# ----------------------------------------------------------------------
# kernel-layout variants (layout_policy='all_kl' trunk)
# ----------------------------------------------------------------------
def _kl(x):
    return jnp.transpose(x, (0, 1, 4, 2, 3))


def _unkl(xk):
    return jnp.transpose(xk, (0, 1, 3, 4, 2))


@pytest.mark.parametrize("k", KERNELS)
def test_conv_s2d_kl_matches_ndhwc(k):
    from medicalseg_tpu.ops.updown import conv_s2d_kl
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(2, 8, 8, 12, 16).astype(np.float32))
    K = jnp.asarray(rng.randn(*k, 16, 32).astype(np.float32))
    b = jnp.asarray(rng.randn(32).astype(np.float32))
    ref = conv_s2d(x, K, b)
    got = _unkl(conv_s2d_kl(_kl(x), K, b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("k", KERNELS)
def test_conv_transpose_d2s_kl_matches_ndhwc(k):
    from medicalseg_tpu.ops.updown import conv_transpose_d2s_kl
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 4, 4, 6, 32).astype(np.float32))
    K = jnp.asarray(rng.randn(*k, 32, 16).astype(np.float32))
    b = jnp.asarray(rng.randn(16).astype(np.float32))
    ref = conv_transpose_d2s(x, K, b)
    got = _unkl(conv_transpose_d2s_kl(_kl(x), K, b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)


def test_conv_z_kl_matches_ndhwc():
    from medicalseg_tpu.ops.updown import (conv_s2d_z, conv_s2d_z_kl,
                                           conv_transpose_d2s_z,
                                           conv_transpose_d2s_z_kl)
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(1, 9, 8, 8, 8).astype(np.float32))
    K = jnp.asarray(rng.randn(4, 2, 2, 8, 16).astype(np.float32))
    b = jnp.asarray(rng.randn(16).astype(np.float32))
    ref = conv_s2d_z(x, K, 1, b)
    got = _unkl(conv_s2d_z_kl(_kl(x), K, 1, b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)
    Kt = jnp.asarray(rng.randn(4, 2, 2, 8, 4).astype(np.float32))
    bt = jnp.asarray(rng.randn(4).astype(np.float32))
    ref = conv_transpose_d2s_z(x, Kt, bt)
    got = _unkl(conv_transpose_d2s_z_kl(_kl(x), Kt, bt))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)


def test_vnet_all_kl_matches_default():
    """layout_policy='all_kl' (full kernel-layout trunk with KL s2d
    up/down matmuls) consumes the default param tree and reproduces the
    default logits at BOTH eval and train — checkpoints interchange and
    the flip-free training path is numerically the same network."""
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.rand(1, 32, 32, 32, 1).astype(np.float32))
    base = VNet(num_classes=3, dropout=False)
    akl = VNet(num_classes=3, dropout=False, head_conv="pallas",
               mid_conv="pallas", updown_conv="s2d",
               layout_policy="all_kl")
    variables = jax.jit(
        lambda k, a: base.init(k, a, train=False))(jax.random.PRNGKey(2),
                                                   x)
    out_b = jax.jit(
        lambda v, a: base.apply(v, a, train=False))(variables, x)[0]
    out_k = jax.jit(
        lambda v, a: akl.apply(v, a, train=False))(variables, x)[0]
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_b),
                               atol=2e-3, rtol=1e-3)

    def loss(model):
        def f(params, a):
            out, _ = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]}, a, train=True,
                mutable=["batch_stats"])
            return jnp.mean(out[0] ** 2)
        return f

    g_b = jax.jit(jax.grad(loss(base)))(variables["params"], x)
    g_k = jax.jit(jax.grad(loss(akl)))(variables["params"], x)
    flat_b = jax.tree_util.tree_leaves(g_b)
    flat_k = jax.tree_util.tree_leaves(g_k)
    for a, b in zip(flat_b, flat_k):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-3, rtol=5e-2)
