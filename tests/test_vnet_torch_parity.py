"""Numerical alignment of the Flax VNet against a PyTorch oracle.

The reference validated its VNet against a torch implementation with
reprod_log forward/loss dumps (reference vnet.py:285-404, SURVEY §4.1).
Here the same methodology runs live: a torch VNet (MedicalZoo-style,
mirroring the reference topology) is built, our Flax parameters are
transplanted into it, and eval-mode forwards are compared elementwise.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from medicalseg_tpu.models import VNet  # noqa: E402


# ----------------------------------------------------------------------
# torch mirror of the reference VNet (eval mode, no dropout)
# ----------------------------------------------------------------------
class TLUConv(tnn.Module):
    def __init__(self, nchan):
        super().__init__()
        self.conv1 = tnn.Conv3d(nchan, nchan, 5, padding=2)
        self.bn1 = tnn.BatchNorm3d(nchan, eps=1e-5)
        self.relu1 = tnn.PReLU(nchan)

    def forward(self, x):
        return self.relu1(self.bn1(self.conv1(x)))


class TInput(tnn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.conv1 = tnn.Conv3d(in_ch, 16, 5, padding=2)
        self.bn1 = tnn.BatchNorm3d(16, eps=1e-5)
        self.relu1 = tnn.PReLU(16)
        self.in_ch = in_ch

    def forward(self, x):
        out = self.bn1(self.conv1(x))
        x_tile = x.repeat(1, 16 // self.in_ch, 1, 1, 1)
        return self.relu1(out + x_tile)


class TDown(tnn.Module):
    def __init__(self, in_ch, n_convs):
        super().__init__()
        out_ch = 2 * in_ch
        self.down_conv = tnn.Conv3d(in_ch, out_ch, 2, stride=2)
        self.bn1 = tnn.BatchNorm3d(out_ch, eps=1e-5)
        self.relu1 = tnn.PReLU(out_ch)
        self.relu2 = tnn.PReLU(out_ch)
        self.ops = tnn.Sequential(*[TLUConv(out_ch)
                                    for _ in range(n_convs)])

    def forward(self, x):
        down = self.relu1(self.bn1(self.down_conv(x)))
        out = self.ops(down)
        return self.relu2(out + down)


class TUp(tnn.Module):
    def __init__(self, in_ch, out_ch, n_convs):
        super().__init__()
        self.up_conv = tnn.ConvTranspose3d(in_ch, out_ch // 2, 2,
                                           stride=2)
        self.bn1 = tnn.BatchNorm3d(out_ch // 2, eps=1e-5)
        self.relu1 = tnn.PReLU(out_ch // 2)
        self.relu2 = tnn.PReLU(out_ch)
        self.ops = tnn.Sequential(*[TLUConv(out_ch)
                                    for _ in range(n_convs)])

    def forward(self, x, skip):
        out = self.relu1(self.bn1(self.up_conv(x)))
        xcat = torch.cat((out, skip), 1)
        out = self.ops(xcat)
        return self.relu2(out + xcat)


class TOut(tnn.Module):
    def __init__(self, in_ch, n_classes):
        super().__init__()
        self.conv1 = tnn.Conv3d(in_ch, n_classes, 5, padding=2)
        self.bn1 = tnn.BatchNorm3d(n_classes, eps=1e-5)
        self.relu1 = tnn.PReLU(n_classes)
        self.conv2 = tnn.Conv3d(n_classes, n_classes, 1)

    def forward(self, x):
        return self.conv2(self.relu1(self.bn1(self.conv1(x))))


class TVNet(tnn.Module):
    def __init__(self, n_classes=3):
        super().__init__()
        self.in_tr = TInput(1)
        self.down_tr32 = TDown(16, 1)
        self.down_tr64 = TDown(32, 2)
        self.down_tr128 = TDown(64, 3)
        self.down_tr256 = TDown(128, 2)
        self.up_tr256 = TUp(256, 256, 2)
        self.up_tr128 = TUp(256, 128, 2)
        self.up_tr64 = TUp(128, 64, 1)
        self.up_tr32 = TUp(64, 32, 1)
        self.out_tr = TOut(32, n_classes)

    def forward(self, x):
        o16 = self.in_tr(x)
        o32 = self.down_tr32(o16)
        o64 = self.down_tr64(o32)
        o128 = self.down_tr128(o64)
        o256 = self.down_tr256(o128)
        o = self.up_tr256(o256, o128)
        o = self.up_tr128(o, o64)
        o = self.up_tr64(o, o32)
        o = self.up_tr32(o, o16)
        return self.out_tr(o)


# ----------------------------------------------------------------------
# weight transplanting flax -> torch
# ----------------------------------------------------------------------
def _set_conv(tconv, kernel, bias):
    # flax Conv kernel: (kd, kh, kw, Cin, Cout) -> torch (Cout, Cin, ...)
    w = np.transpose(np.asarray(kernel), (4, 3, 0, 1, 2))
    tconv.weight.data = torch.tensor(w)
    tconv.bias.data = torch.tensor(np.asarray(bias))


def _set_deconv(tconv, kernel, bias):
    # flax ConvTranspose kernel: (kd, kh, kw, Cin, Cout) -> torch
    # ConvTranspose3d (Cin, Cout, kd, kh, kw), spatially flipped
    # (lax.conv_transpose with transpose_kernel=False correlates the
    # un-flipped kernel; torch's deconv is the conv gradient).
    w = np.asarray(kernel)[::-1, ::-1, ::-1]
    w = np.transpose(w, (3, 4, 0, 1, 2)).copy()
    tconv.weight.data = torch.tensor(w)
    tconv.bias.data = torch.tensor(np.asarray(bias))


def _set_bn(tbn, params, stats):
    tbn.weight.data = torch.tensor(np.asarray(params["scale"]))
    tbn.bias.data = torch.tensor(np.asarray(params["bias"]))
    tbn.running_mean.data = torch.tensor(np.asarray(stats["mean"]))
    tbn.running_var.data = torch.tensor(np.asarray(stats["var"]))


def _set_prelu(tp, params):
    tp.weight.data = torch.tensor(np.asarray(params["alpha"]))


def _set_lu(tlu, p, s):
    _set_conv(tlu.conv1, p["Conv_0"]["kernel"], p["Conv_0"]["bias"])
    _set_bn(tlu.bn1, p["BatchNorm3D_0"], s["BatchNorm3D_0"])
    _set_prelu(tlu.relu1, p["Activation_0"]["PReLU_0"])


def _transplant(tmodel, variables):
    p = variables["params"]
    s = variables["batch_stats"]

    it_p, it_s = p["InputTransition_0"], s["InputTransition_0"]
    _set_conv(tmodel.in_tr.conv1, it_p["Conv_0"]["kernel"],
              it_p["Conv_0"]["bias"])
    _set_bn(tmodel.in_tr.bn1, it_p["BatchNorm3D_0"],
            it_s["BatchNorm3D_0"])
    _set_prelu(tmodel.in_tr.relu1, it_p["Activation_0"]["PReLU_0"])

    downs = [(tmodel.down_tr32, "DownTransition_0", 1),
             (tmodel.down_tr64, "DownTransition_1", 2),
             (tmodel.down_tr128, "DownTransition_2", 3),
             (tmodel.down_tr256, "DownTransition_3", 2)]
    for tmod, name, n_convs in downs:
        dp, ds = p[name], s[name]
        _set_conv(tmod.down_conv, dp["Conv_0"]["kernel"],
                  dp["Conv_0"]["bias"])
        _set_bn(tmod.bn1, dp["BatchNorm3D_0"], ds["BatchNorm3D_0"])
        _set_prelu(tmod.relu1, dp["Activation_0"]["PReLU_0"])
        for i in range(n_convs):
            _set_lu(tmod.ops[i], dp["NConvs_0"]["ConvBNAct_{}".format(i)],
                    ds["NConvs_0"]["ConvBNAct_{}".format(i)])
        _set_prelu(tmod.relu2, dp["Activation_1"]["PReLU_0"])

    ups = [(tmodel.up_tr256, "UpTransition_0", 2),
           (tmodel.up_tr128, "UpTransition_1", 2),
           (tmodel.up_tr64, "UpTransition_2", 1),
           (tmodel.up_tr32, "UpTransition_3", 1)]
    for tmod, name, n_convs in ups:
        up, us = p[name], s[name]
        _set_deconv(tmod.up_conv, up["ConvTranspose_0"]["kernel"],
                    up["ConvTranspose_0"]["bias"])
        _set_bn(tmod.bn1, up["BatchNorm3D_0"], us["BatchNorm3D_0"])
        _set_prelu(tmod.relu1, up["Activation_0"]["PReLU_0"])
        for i in range(n_convs):
            _set_lu(tmod.ops[i], up["NConvs_0"]["ConvBNAct_{}".format(i)],
                    us["NConvs_0"]["ConvBNAct_{}".format(i)])
        _set_prelu(tmod.relu2, up["Activation_1"]["PReLU_0"])

    op, os_ = p["OutputTransition_0"], s["OutputTransition_0"]
    cba_p = op["ConvBNAct_0"]
    cba_s = os_["ConvBNAct_0"]
    _set_conv(tmodel.out_tr.conv1, cba_p["Conv_0"]["kernel"],
              cba_p["Conv_0"]["bias"])
    _set_bn(tmodel.out_tr.bn1, cba_p["BatchNorm3D_0"],
            cba_s["BatchNorm3D_0"])
    _set_prelu(tmodel.out_tr.relu1,
               cba_p["Activation_0"]["PReLU_0"])
    _set_conv(tmodel.out_tr.conv2, op["Conv_0"]["kernel"],
              op["Conv_0"]["bias"])


def test_vnet_forward_matches_torch():
    model = VNet(in_channels=1, num_classes=3)
    rng = np.random.RandomState(0)
    x = rng.rand(1, 16, 16, 16, 1).astype(np.float32)
    variables = jax.jit(
        lambda k, v: model.init(k, v, train=False))(
        jax.random.PRNGKey(42), jnp.asarray(x))
    # randomize BN stats so the eval-mode normalize is non-trivial
    import flax
    stats = flax.core.unfreeze(variables["batch_stats"])
    leaves, treedef = jax.tree_util.tree_flatten(stats)
    new_leaves = []
    for i, leaf in enumerate(leaves):
        r = rng.rand(*leaf.shape).astype(np.float32)
        new_leaves.append(jnp.asarray(0.5 + 0.1 * r))
    variables = {"params": variables["params"],
                 "batch_stats": jax.tree_util.tree_unflatten(
                     treedef, new_leaves)}

    ours = np.asarray(jax.jit(
        lambda v, a: model.apply(v, a, train=False))(
        variables, jnp.asarray(x))[0])

    tmodel = TVNet(3).eval()
    _transplant(tmodel, jax.device_get(variables))
    with torch.no_grad():
        theirs = tmodel(torch.tensor(
            np.transpose(x, (0, 4, 1, 2, 3)))).numpy()
    theirs = np.transpose(theirs, (0, 2, 3, 4, 1))

    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)
