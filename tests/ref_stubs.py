"""Minimal third-party stubs so the REFERENCE code imports offline.

The reference's model/engine files pull in timm, torchvision and wandb —
none needed at runtime for the code paths the parity tests execute (eval /
CPU train with drop rates 0). Only glue symbols are stubbed; `accuracy` is
the one stub with real behavior (the standard top-k accuracy-in-percent
contract of timm.utils.accuracy, which engine_finetune.py:63 meters with).

Shared by tests/test_reference_parity.py (module-level parity) and
tests/test_engine_parity.py (whole-loop parity): stubs must be installed
exactly once per process, before any `import models_simmim` etc.
"""
import sys
import types

import torch


def install_stubs():
    if "timm" in sys.modules:
        return
    timm = types.ModuleType("timm")
    tm = types.ModuleType("timm.models")
    tl = types.ModuleType("timm.models.layers")
    tvt = types.ModuleType("timm.models.vision_transformer")
    td = types.ModuleType("timm.data")
    tu = types.ModuleType("timm.utils")
    tl.drop_path = lambda x, drop_prob=0.0, training=False: x

    class DropPath(torch.nn.Module):
        def __init__(self, p=None):
            super().__init__()

        def forward(self, x):
            return x

    def trunc_normal_(t, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            t.normal_(mean, std)
        return t

    tl.DropPath = DropPath
    tl.trunc_normal_ = trunc_normal_
    tl.to_2tuple = lambda v: v if isinstance(v, tuple) else (v, v)

    class _VT(torch.nn.Module):
        pass

    class _Mlp(torch.nn.Module):
        pass

    class _PatchEmbed(torch.nn.Module):
        pass

    class _Block(torch.nn.Module):
        pass

    tvt.VisionTransformer = _VT
    tvt.Mlp = _Mlp
    tvt.PatchEmbed = _PatchEmbed
    tvt.Block = _Block

    class Mixup:  # engine_finetune imports it; parity runs never enable it
        def __init__(self, *a, **k):
            raise NotImplementedError("Mixup stub")

    td.Mixup = Mixup

    def accuracy(output, target, topk=(1,)):
        """timm.utils.accuracy contract: top-k accuracy in percent."""
        maxk = max(topk)
        _, pred = output.topk(maxk, 1, True, True)
        correct = pred.t().eq(target.reshape(1, -1))
        return [correct[:k].reshape(-1).float().sum(0) * 100.0 / target.size(0)
                for k in topk]

    tu.accuracy = accuracy

    timm.models = tm
    timm.layers = tl
    timm.data = td
    timm.utils = tu
    tm.layers = tl
    tm.vision_transformer = tvt
    tv = types.ModuleType("torchvision")
    tvo = types.ModuleType("torchvision.ops")
    tvm = types.ModuleType("torchvision.ops.misc")

    class FrozenBatchNorm2d(torch.nn.Module):
        pass

    tvm.FrozenBatchNorm2d = FrozenBatchNorm2d
    tvo.misc = tvm
    tv.ops = tvo

    mods = {
        "timm": timm, "timm.models": tm, "timm.models.layers": tl,
        "timm.models.vision_transformer": tvt, "timm.layers": tl,
        "timm.data": td, "timm.utils": tu,
        "torchvision": tv, "torchvision.ops": tvo,
        "torchvision.ops.misc": tvm,
    }
    if "wandb" not in sys.modules:
        try:
            import wandb  # noqa: F401
        except ImportError:
            mods["wandb"] = types.ModuleType("wandb")  # util/misc.py:11
    sys.modules.update(mods)
