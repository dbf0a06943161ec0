"""Pallas 5^3 conv kernels vs the XLA conv oracle (interpret mode on
CPU; the real Mosaic path runs on TPU in bench.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medicalseg_tpu.ops import pallas_conv5 as pc


def _data(n, d, h, w, ci, co, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d, h, w, ci).astype(np.float32)
    k = (rng.randn(5, 5, 5, ci, co) / np.sqrt(125 * ci)).astype(
        np.float32)
    b = rng.randn(co).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(k), jnp.asarray(b)


def test_head_kernel_matches_xla():
    x, k, b = _data(2, 8, 8, 16, ci=8, co=3)
    ref = pc._conv5_xla(x, k, b)
    got = pc.conv5(x, k, b, "head", True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)  # bf16 matmul


def test_head_kernel_odd_tile_shapes():
    # d=4, h=2 forces the smaller tile candidates
    x, k, b = _data(1, 4, 2, 8, ci=4, co=2, seed=1)
    ref = pc._conv5_xla(x, k, b)
    got = pc.conv5(x, k, b, "head", True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_stem_kernel_matches_xla():
    x, k, b = _data(2, 8, 8, 16, ci=1, co=16, seed=2)
    ref = pc._conv5_xla(x, k, b)
    got = pc.conv5(x, k, b, "stem", True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_conv5_gradients_match_xla():
    """The custom VJP routes backward through the XLA conv — grads must
    equal autodiff of the stock conv exactly."""
    x, k, b = _data(1, 4, 4, 8, ci=2, co=2, seed=3)

    def loss_pallas(x, k, b):
        return jnp.sum(pc.conv5(x, k, b, "head", True) ** 2)

    def loss_xla(x, k, b):
        return jnp.sum(pc._conv5_xla(x, k, b) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, k, b)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, k, b)
    for a, c in zip(gp, gx):
        # fwd differs by bf16 rounding inside sum-of-squares -> loose
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=5e-2, rtol=5e-2)


def test_eligibility():
    assert pc.head_eligible((1, 128, 128, 128, 32), 32, 3)
    assert not pc.head_eligible((1, 128, 128, 100, 32), 32, 3)  # W%32
    assert pc.head_eligible((1, 128, 128, 128, 32), 32, 64)  # chunked co
    assert pc.head_eligible((1, 128, 128, 128, 32), 32, 80)  # chunked co
    assert pc.head_eligible((1, 64, 64, 64, 64), 64, 64)  # 64^3 stage
    # C=128 stacks (UpTransition_1 at the spine geometry) are eligible
    # in bf16 — 5*Ci = 640 tiles the MXU K axis exactly; the f32 weight
    # block would blow the VMEM budget, so f32 stays ineligible
    assert pc.head_eligible((1, 8, 128, 128, 128), 128, 128,
                            dtype=jnp.bfloat16)
    assert not pc.head_eligible((1, 8, 128, 128, 128), 128, 128)
    assert not pc.head_eligible((1, 4, 64, 64, 256), 256, 256,
                                dtype=jnp.bfloat16)  # Ci cap
    assert pc.stem_eligible((1, 128, 128, 128, 1), 1, 16)
    assert not pc.stem_eligible((1, 128, 128, 128, 4), 4, 16)


def test_conv5_wide_chunked_matches_xla():
    """Ci=256 (the deep V-Net stacks): the co-chunked wide form — chunk
    size picked by the VMEM budget — must match the XLA conv, and its
    dgrad (routed back through the chunked kernel) must match autodiff
    of the stock conv. Uses an eligibility-passing aligned shape so the
    kernel path (not the XLA fallback) is exercised."""
    x, k, b = _data(1, 2, 4, 32, ci=256, co=64, seed=13)
    assert pc.wide_eligible(x.shape, 256, 64, dtype=x.dtype)
    assert pc._wide_chunk(x.shape, 256, 64, x.dtype) == 32
    ref = pc._conv5_xla(x, k, b)
    got = pc.conv5_wide(x, k, b, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)

    def loss_pallas(x, k, b):
        return jnp.sum(pc.conv5_wide(x, k, b, True) ** 2)

    def loss_xla(x, k, b):
        return jnp.sum(pc._conv5_xla(x, k, b) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, k, b)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, k, b)
    for a, c in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=5e-2, rtol=5e-2)


def test_head_kernel_wide_channels_matches_xla():
    """Ci=Co=128 (the widest now-eligible stack): kernel == XLA conv."""
    x, k, b = _data(1, 4, 4, 16, ci=128, co=128, seed=11)
    ref = pc._conv5_xla(x, k, b)
    got = pc.conv5(x, k, b, "head", True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_wide_channel_gradients_match_xla():
    """At Ci=Co=128 the dgrad kernel is eligible (co -> ci stays 128)
    while the wgrad falls back to the XLA VJP — both must match
    autodiff of the stock conv."""
    x, k, b = _data(1, 4, 2, 8, ci=128, co=128, seed=12)

    def loss_pallas(x, k, b):
        return jnp.sum(pc.conv5(x, k, b, "head", True) ** 2)

    def loss_xla(x, k, b):
        return jnp.sum(pc._conv5_xla(x, k, b) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, k, b)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, k, b)
    for a, c in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=5e-2, rtol=5e-2)


def test_model_pallas_head_matches_default():
    """OutputTransition/InputTransition with the Pallas conv produce the
    same output as the default XLA conv under transplanted params (the
    param trees are name-compatible by construction)."""
    from medicalseg_tpu.models.vnet import InputTransition, OutputTransition

    rng = np.random.RandomState(4)
    key = jax.random.PRNGKey(0)

    # head: eligible shape (W=128); ci=8 keeps CPU interpret fast
    x = jnp.asarray(rng.randn(1, 4, 8, 128, 8).astype(np.float32))
    m_def = OutputTransition(num_classes=3, head_conv="default")
    m_pal = OutputTransition(num_classes=3, head_conv="pallas")
    v = jax.jit(lambda k, x: m_def.init(k, x, train=False))(key, x)
    o_def = m_def.apply(v, x, train=False)
    o_pal = m_pal.apply(v, x, train=False)  # same tree: transplanted
    np.testing.assert_allclose(np.asarray(o_pal), np.asarray(o_def),
                               atol=2e-2, rtol=2e-2)

    # stem
    xs = jnp.asarray(rng.randn(1, 4, 8, 128, 1).astype(np.float32))
    s_def = InputTransition(1)
    s_pal = InputTransition(1, stem_conv="pallas")
    vs = jax.jit(lambda k, x: s_def.init(k, x, train=False))(key, xs)
    np.testing.assert_allclose(
        np.asarray(s_pal.apply(vs, xs, train=False)),
        np.asarray(s_def.apply(vs, xs, train=False)),
        atol=2e-2, rtol=2e-2)


def test_model_pallas_fallback_ineligible():
    """Ineligible shapes (W not lane-aligned) silently use the XLA conv
    — numerics then match the default path exactly."""
    from medicalseg_tpu.models.vnet import OutputTransition

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 4, 8, 32, 8).astype(np.float32))
    m_def = OutputTransition(num_classes=3, head_conv="default")
    m_pal = OutputTransition(num_classes=3, head_conv="pallas")
    v = jax.jit(lambda k, x: m_def.init(k, x, train=False))(
        jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(m_pal.apply(v, x, train=False)),
        np.asarray(m_def.apply(v, x, train=False)), atol=1e-5, rtol=1e-5)


def test_pallas_backward_matches_xla_vjp():
    """On eligible shapes the custom VJP uses the Pallas dgrad/wgrad
    kernels — compare against autodiff of the stock conv."""
    rng = np.random.RandomState(7)
    for kind, ci, co in (("head", 8, 3), ("stem", 1, 16)):
        x = jnp.asarray(rng.randn(1, 4, 8, 128, ci).astype(np.float32))
        k = jnp.asarray((rng.randn(5, 5, 5, ci, co) /
                         np.sqrt(125 * ci)).astype(np.float32))
        b = jnp.asarray(rng.randn(co).astype(np.float32))
        g = jnp.asarray(rng.randn(1, 4, 8, 128, co).astype(np.float32))

        def f_pal(x, k, b):
            return jnp.vdot(pc.conv5(x, k, b, kind, True), g)

        def f_xla(x, k, b):
            return jnp.vdot(pc._conv5_xla(x, k, b), g)

        gp = jax.grad(f_pal, argnums=(0, 1, 2))(x, k, b)
        gx = jax.grad(f_xla, argnums=(0, 1, 2))(x, k, b)
        for a, c in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       atol=5e-3, rtol=5e-3,
                                       err_msg=kind)


def test_head_kernel_w64_and_chunked_co():
    """W%32 eligibility (64^3-stage shapes) and the co-chunked fold for
    wide heads (co=32 -> 4 chunks of 8)."""
    x, k, b = _data(1, 4, 8, 64, ci=16, co=32, seed=8)
    assert pc.head_eligible(x.shape, 16, 32)
    ref = pc._conv5_xla(x, k, b)
    got = pc.conv5(x, k, b, "head", True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)
    # odd W stays ineligible
    assert not pc.head_eligible((1, 4, 8, 48, 16), 16, 32)


def test_mid_wgrad_matches_xla_vjp():
    """The square-conv (mid) Pallas wgrad: co too wide for the
    25x-expanded path routes to the kw-expanded kernel."""
    rng = np.random.RandomState(9)
    ci, co = 8, 24  # co > 16 -> mid wgrad path
    x = jnp.asarray(rng.randn(1, 4, 8, 128, ci).astype(np.float32))
    k = jnp.asarray((rng.randn(5, 5, 5, ci, co) /
                     np.sqrt(125 * ci)).astype(np.float32))
    b = jnp.asarray(rng.randn(co).astype(np.float32))
    g = jnp.asarray(rng.randn(1, 4, 8, 128, co).astype(np.float32))

    def f_pal(k_):
        return jnp.vdot(pc.conv5(x, k_, b, "head", True), g)

    def f_xla(k_):
        return jnp.vdot(pc._conv5_xla(x, k_, b), g)

    gp = jax.grad(f_pal)(k)
    gx = jax.grad(f_xla)(k)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               atol=5e-3, rtol=5e-3)


def test_mid_wgrad_compact_vs_host_expansion():
    """The in-kernel compact-g expansion (co a sublane multiple) and
    the host-expanded fallback (odd co, e.g. a 20-class head) both
    match the XLA conv's weight gradient."""
    rng = np.random.RandomState(11)
    ci = 8
    for co in (32, 20):  # 32 -> compact kernel, 20 -> host expansion
        x = jnp.asarray(rng.randn(1, 4, 8, 128, ci).astype(np.float32))
        g = jnp.asarray(rng.randn(1, 4, 8, 128, co).astype(np.float32))
        k = jnp.asarray((rng.randn(5, 5, 5, ci, co) /
                         np.sqrt(125 * ci)).astype(np.float32))
        b = jnp.zeros((co,), np.float32)
        assert (pc._round_up(5 * co, 8) == 5 * co and co % 8 == 0) == \
            (co == 32)
        dw = pc._conv5_wgrad_mid_pallas(x, g, interpret=True)
        ref = jax.grad(
            lambda k_: jnp.vdot(pc._conv5_xla(x, k_, b), g))(k)
        np.testing.assert_allclose(np.asarray(dw), np.asarray(ref),
                                   atol=5e-3, rtol=5e-3)


def test_conv5_batch_sharded_partitioning():
    """Under a batch-sharded pjit the custom_partitioning rules shard
    the kernel over the batch axis (not replicate it), keep the output
    batch-sharded, and psum the weight gradient."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(8, 4, 8, 128, 8).astype(np.float32))
    k = jnp.asarray((rng.randn(5, 5, 5, 8, 3) / np.sqrt(1000)).astype(
        np.float32))
    b = jnp.asarray(rng.randn(3).astype(np.float32))
    xs = jax.device_put(x, NamedSharding(mesh, PS("data")))

    f = jax.jit(lambda x, k, b: pc.conv5(x, k, b, "head", True))
    out = f(xs, k, b)
    assert out.sharding.spec == PS("data"), out.sharding
    np.testing.assert_allclose(np.asarray(out), np.asarray(f(x, k, b)),
                               atol=1e-5, rtol=1e-5)

    # grads: sharded == unsharded (wgrad psum across shards)
    def loss(x, k, b):
        return jnp.sum(pc.conv5(x, k, b, "head", True) ** 2)

    g_sh = jax.jit(jax.grad(loss, argnums=(1, 2)))(xs, k, b)
    g_un = jax.jit(jax.grad(loss, argnums=(1, 2)))(x, k, b)
    for a, c in zip(g_sh, g_un):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-4, rtol=1e-4)


def test_conv5_space_sharded_partitioning():
    """Under an H-sharded ('space') pjit the partitioning rules run the
    kernel per-shard after a ppermute halo exchange — output stays
    H-sharded and fwd+grads match the unsharded program."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("data", "space"))
    rng = np.random.RandomState(13)
    # h=8 over space=2 -> local 4+4 halo = 8: Pallas-eligible per shard
    x = jnp.asarray(rng.randn(2, 4, 8, 128, 8).astype(np.float32))
    k = jnp.asarray((rng.randn(5, 5, 5, 8, 3) / np.sqrt(1000)).astype(
        np.float32))
    b = jnp.asarray(rng.randn(3).astype(np.float32))
    sh = NamedSharding(mesh, PS("data", None, "space"))
    xs = jax.device_put(x, sh)

    f = jax.jit(lambda x, k, b: pc.conv5(x, k, b, "head", True))
    out = f(xs, k, b)
    assert out.sharding.spec[:3] == PS("data", None, "space")[:3], \
        out.sharding
    np.testing.assert_allclose(np.asarray(out), np.asarray(f(x, k, b)),
                               atol=1e-4, rtol=1e-4)

    def loss(x, k, b):
        return jnp.sum(pc.conv5(x, k, b, "head", True) ** 2)

    g_sh = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(xs, k, b)
    g_un = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(x, k, b)
    for a, c in zip(g_sh, g_un):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_vnet_pallas_space_sharded_matches_default():
    """VNet(head/mid='pallas') under a space=2 mesh == default convs on
    the same params (VERDICT r2 #5: the production config must hold
    under every mesh)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

    from medicalseg_tpu.models import VNet

    devs = np.array(jax.devices()[:2]).reshape(1, 2)
    mesh = Mesh(devs, ("data", "space"))
    rng = np.random.RandomState(17)
    x = jnp.asarray(rng.randn(1, 16, 16, 128, 1).astype(np.float32))

    m_def = VNet(in_channels=1, num_classes=3)
    m_pal = VNet(in_channels=1, num_classes=3, head_conv="pallas",
                 mid_conv="pallas")
    v = jax.jit(lambda kk, xx: m_def.init(kk, xx, train=False))(
        jax.random.PRNGKey(0), x)

    xs = jax.device_put(x, NamedSharding(mesh, PS(None, None, "space")))
    o_def = jax.jit(lambda v, x: m_def.apply(v, x, train=False)[0])(v, x)
    o_pal = jax.jit(lambda v, x: m_pal.apply(v, x, train=False)[0])(
        v, xs)
    np.testing.assert_allclose(np.asarray(o_pal), np.asarray(o_def),
                               atol=2e-2, rtol=2e-2)


def test_pin_kl_identity_vjp_and_sharding():
    """pin_kl (the KL boundary layout pin) must be a bit-exact identity
    with an identity VJP, and preserve the operand sharding under a
    mesh (its custom_partitioning forwards the input spec)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    x = jnp.asarray(np.random.RandomState(0).rand(4, 2, 16, 8, 128),
                    jnp.float32)
    y, vjp = jax.vjp(pc._pin, x)
    assert jnp.array_equal(y, x)
    assert jnp.array_equal(vjp(2 * x)[0], 2 * x)

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("data", "space"))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None,
                                                 "space")))
    with mesh:
        ys = jax.jit(pc._pin)(xs)
    assert jnp.array_equal(np.asarray(ys), np.asarray(x))
    assert ys.sharding.spec == P("data", None, None, "space")


# ----------------------------------------------------------------------
# fused BN/PReLU epilogue (inference-only)
# ----------------------------------------------------------------------
def _ep(co, seed=0):
    rng = np.random.RandomState(seed)
    inv = jnp.asarray(rng.uniform(0.5, 2.0, co).astype(np.float32))
    shift = jnp.asarray(rng.randn(co).astype(np.float32) * 0.1)
    alpha = jnp.asarray(rng.uniform(0.05, 0.5, co).astype(np.float32))
    return inv, shift, alpha


def test_conv5_kl_fused_matches_separate_head():
    """In-kernel BN-affine + PReLU epilogue == conv then the reference
    elementwise ops (the HBM-round-trip path it replaces)."""
    x, k, b = _data(2, 6, 4, 8, ci=8, co=3, seed=11)
    xk = pc.to_kl(x)
    ep = _ep(3, seed=1)
    ref = pc.ep_apply_kl(pc.conv5_kl(xk, k, b, "head", True), ep)
    got = pc.conv5_kl_fused(xk, k, b, ep, "head", True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)
    # negative inputs must take the alpha slope, not relu-zero
    assert (np.asarray(got) < 0).any()


def test_conv5_kl_fused_matches_separate_stem():
    x, k, b = _data(1, 6, 4, 8, ci=1, co=16, seed=12)
    xk = pc.to_kl(x)
    ep = _ep(16, seed=2)
    ref = pc.ep_apply_kl(pc.conv5_kl(xk, k, b, "stem", True), ep)
    got = pc.conv5_kl_fused(xk, k, b, ep, "stem", True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_conv5_kl_fused_alpha_one_is_affine_only():
    """alpha=1 (the InputTransition stem fusion) must reduce to a pure
    affine — identical on both sides of zero."""
    x, k, b = _data(1, 4, 2, 8, ci=4, co=8, seed=13)
    xk = pc.to_kl(x)
    inv, shift, _ = _ep(8, seed=3)
    ones = jnp.ones_like(inv)
    y = pc.conv5_kl(xk, k, b, "head", True).astype(jnp.float32)
    ref = y * inv.reshape(1, 1, -1, 1, 1) + shift.reshape(1, 1, -1, 1, 1)
    got = pc.conv5_kl_fused(xk, k, b, (inv, shift, ones), "head", True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_convbnact_kl_eval_fuses_and_matches():
    """ConvBNAct(layout='kl') at eval folds BN+PReLU into the conv
    epilogue; output must match the module's separate-op math computed
    from the same variables, and the param tree must be identical to
    the train-mode (unfused) structure."""
    from medicalseg_tpu.models.layers import ConvBNAct

    rng = np.random.RandomState(21)
    xk = jnp.asarray(rng.randn(1, 6, 8, 4, 8).astype(np.float32))
    mod = ConvBNAct(8, elu=False, dtype=jnp.float32, lane_pad="pallas",
                    layout="kl")
    v_eval = mod.init(jax.random.PRNGKey(0), xk, train=False)
    v_train = mod.init(jax.random.PRNGKey(0), xk, train=True)
    assert jax.tree_util.tree_structure(v_eval) == \
        jax.tree_util.tree_structure(v_train)

    # perturb BN stats/params so the affine is non-trivial
    p = jax.tree_util.tree_map(np.array, jax.device_get(v_eval))
    p["batch_stats"]["BatchNorm3D_0"]["mean"] = \
        p["batch_stats"]["BatchNorm3D_0"]["mean"] + 0.3
    p["batch_stats"]["BatchNorm3D_0"]["var"] = \
        p["batch_stats"]["BatchNorm3D_0"]["var"] * 1.7
    p["params"]["BatchNorm3D_0"]["scale"] = \
        p["params"]["BatchNorm3D_0"]["scale"] * 1.2
    p["params"]["BatchNorm3D_0"]["bias"] = \
        p["params"]["BatchNorm3D_0"]["bias"] - 0.1

    got = mod.apply(p, xk, train=False)

    bnp = p["params"]["BatchNorm3D_0"]
    bns = p["batch_stats"]["BatchNorm3D_0"]
    inv = bnp["scale"] / np.sqrt(bns["var"] + 1e-5)
    shift = bnp["bias"] - bns["mean"] * inv
    alpha = p["params"]["Activation_0"]["PReLU_0"]["alpha"]
    y = pc.conv5_kl(xk, jnp.asarray(p["params"]["Conv_0"]["kernel"]),
                    jnp.asarray(p["params"]["Conv_0"]["bias"]),
                    "head", True)
    ref = pc.ep_apply_kl(y, (jnp.asarray(inv), jnp.asarray(shift),
                             jnp.asarray(alpha)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)
