"""Import the *actual* reference source (/root/reference) for golden tests.

The reference depends on mmcv/mmseg/torchvision/pytorch_lightning/flow_vis,
none of which are installed here. This harness installs minimal, faithful
stand-ins for exactly the symbols the reference modules touch at import and
at forward time (mmcv's ConvModule/build_*_layer, mmseg's resize, the image
ops backed by cv2 — the same library mmcv itself wraps), then imports the
reference modules so tests can compare our JAX implementations against the
reference's real torch math rather than hand-written replicas
(VERDICT.md "Next round" item 1).

Only ever used by tests; never imported by the framework.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

REFERENCE_ROOT = "/root/reference"

_loaded: dict = {}


# ---------------------------------------------------------------- mmcv image
def _imresize(img, size, return_scale=False, interpolation="bilinear", out=None,
              backend=None):
    """mmcv.imresize: size is (w, h). Backed by cv2 like mmcv itself."""
    import cv2

    h, w = img.shape[:2]
    interp = {
        "nearest": cv2.INTER_NEAREST,
        "bilinear": cv2.INTER_LINEAR,
        "bicubic": cv2.INTER_CUBIC,
        "area": cv2.INTER_AREA,
        "lanczos": cv2.INTER_LANCZOS4,
    }[interpolation]
    resized = cv2.resize(img, tuple(size), interpolation=interp)
    if not return_scale:
        return resized
    return resized, size[0] / w, size[1] / h


def _scale_size(size, scale):
    # mmcv.image.geometric._scale_size: rounds with +0.5 (size is (w, h)).
    w, h = size
    return int(w * float(scale) + 0.5), int(h * float(scale) + 0.5)


def _rescale_size(old_size, scale, return_scale=False):
    w, h = old_size
    if isinstance(scale, (float, int)):
        scale_factor = scale
    elif isinstance(scale, tuple):
        max_long_edge = max(scale)
        max_short_edge = min(scale)
        scale_factor = min(max_long_edge / max(h, w), max_short_edge / min(h, w))
    else:
        raise TypeError(f"Scale must be number or tuple of int, got {type(scale)}")
    new_size = _scale_size((w, h), scale_factor)
    if return_scale:
        return new_size, scale_factor
    return new_size


def _imrescale(img, scale, return_scale=False, interpolation="bilinear", backend=None):
    h, w = img.shape[:2]
    new_size, scale_factor = _rescale_size((w, h), scale, return_scale=True)
    rescaled = _imresize(img, new_size, interpolation=interpolation)
    if return_scale:
        return rescaled, scale_factor
    return rescaled


def _imflip(img, direction="horizontal"):
    if direction == "horizontal":
        return np.flip(img, axis=1)
    if direction == "vertical":
        return np.flip(img, axis=0)
    return np.flip(img, axis=(0, 1))


def _imnormalize(img, mean, std, to_rgb=True):
    import cv2

    img = np.float32(img).copy()
    mean = np.float64(np.asarray(mean).reshape(1, -1))
    stdinv = 1.0 / np.float64(np.asarray(std).reshape(1, -1))
    if to_rgb:
        cv2.cvtColor(img, cv2.COLOR_BGR2RGB, img)
    cv2.subtract(img, mean, img)
    cv2.multiply(img, stdinv, img)
    return img


def _impad(img, *, shape=None, padding=None, pad_val=0, padding_mode="constant"):
    if shape is not None:
        width = max(shape[1] - img.shape[1], 0)
        height = max(shape[0] - img.shape[0], 0)
        padding = (0, 0, width, height)
    # padding: (left, top, right, bottom)
    import cv2

    return cv2.copyMakeBorder(
        img, padding[1], padding[3], padding[0], padding[2],
        cv2.BORDER_CONSTANT, value=pad_val,
    )


def _impad_to_multiple(img, divisor, pad_val=0):
    pad_h = int(np.ceil(img.shape[0] / divisor)) * divisor
    pad_w = int(np.ceil(img.shape[1] / divisor)) * divisor
    return _impad(img, shape=(pad_h, pad_w), pad_val=pad_val)


def _convert_color_factory(src, dst):
    import cv2

    code = getattr(cv2, f"COLOR_{src.upper()}2{dst.upper()}")

    def convert_color(img):
        return cv2.cvtColor(img, code)

    return convert_color


def _is_list_of(seq, expected_type):
    if not isinstance(seq, list):
        return False
    return all(isinstance(item, expected_type) for item in seq)


# ----------------------------------------------------------------- mmcv.cnn
def _build_conv_layer(cfg, *args, **kwargs):
    assert cfg is None or cfg.get("type", "Conv2d") in ("Conv2d", "Conv"), cfg
    return nn.Conv2d(*args, **kwargs)


def _build_norm_layer(cfg, num_features, postfix=""):
    cfg = dict(cfg)
    layer_type = cfg.pop("type")
    requires_grad = cfg.pop("requires_grad", True)
    assert layer_type in ("BN", "BN2d", "SyncBN"), layer_type
    layer = nn.BatchNorm2d(num_features, **cfg)
    for param in layer.parameters():
        param.requires_grad = requires_grad
    # mmcv names BN/SyncBN layers 'bn<postfix>'.
    return f"bn{postfix}", layer


def _build_plugin_layer(cfg, postfix="", **kwargs):  # pragma: no cover
    raise NotImplementedError("no RCF/AMD config uses backbone plugins")


def _kaiming_init(module, a=0, mode="fan_out", nonlinearity="relu", bias=0,
                  distribution="normal"):
    if distribution == "normal":
        nn.init.kaiming_normal_(module.weight, a=a, mode=mode, nonlinearity=nonlinearity)
    else:
        nn.init.kaiming_uniform_(module.weight, a=a, mode=mode, nonlinearity=nonlinearity)
    if hasattr(module, "bias") and module.bias is not None:
        nn.init.constant_(module.bias, bias)


def _constant_init(module, val, bias=0):
    if hasattr(module, "weight") and module.weight is not None:
        nn.init.constant_(module.weight, val)
    if hasattr(module, "bias") and module.bias is not None:
        nn.init.constant_(module.bias, bias)


def _normal_init(module, mean=0, std=1, bias=0):
    nn.init.normal_(module.weight, mean, std)
    if hasattr(module, "bias") and module.bias is not None:
        nn.init.constant_(module.bias, bias)


class _ConvModule(nn.Module):
    """Faithful subset of mmcv.cnn.ConvModule for the configs RCF/AMD use:

    order ('conv', 'norm', 'act'), bias='auto' (False when normed), BN/SyncBN
    norm, ReLU(inplace) activation. State-dict children are named `conv` and
    `bn` exactly like mmcv so checkpoints round-trip.
    """

    def __init__(self, in_channels, out_channels, kernel_size, stride=1, padding=0,
                 dilation=1, groups=1, bias="auto", conv_cfg=None, norm_cfg=None,
                 act_cfg=dict(type="ReLU"), inplace=True, order=("conv", "norm", "act")):
        super().__init__()
        assert order == ("conv", "norm", "act")
        self.with_norm = norm_cfg is not None
        self.with_activation = act_cfg is not None
        if bias == "auto":
            bias = not self.with_norm
        self.conv = _build_conv_layer(
            conv_cfg, in_channels, out_channels, kernel_size, stride=stride,
            padding=padding, dilation=dilation, groups=groups, bias=bias,
        )
        if self.with_norm:
            self.norm_name, norm = _build_norm_layer(norm_cfg, out_channels)
            self.add_module(self.norm_name, norm)
        if self.with_activation:
            assert act_cfg.get("type", "ReLU") == "ReLU", act_cfg
            self.activate = nn.ReLU(inplace=inplace)
        # mmcv initializes conv with kaiming (nonlinearity matching the act)
        # and norm with constant 1 — match so fresh modules are comparable.
        _kaiming_init(self.conv, nonlinearity="relu")
        if self.with_norm:
            _constant_init(getattr(self, self.norm_name), 1, bias=0)

    @property
    def norm(self):
        return getattr(self, self.norm_name) if self.with_norm else None

    def forward(self, x, activate=True, norm=True):
        x = self.conv(x)
        if norm and self.with_norm:
            x = self.norm(x)
        if activate and self.with_activation:
            x = self.activate(x)
        return x


# ----------------------------------------------------------------- mmseg
def _resize(input, size=None, scale_factor=None, mode="nearest", align_corners=None,
            warning=True):
    return F.interpolate(input, size, scale_factor, mode, align_corners)


# ---------------------------------------------------------------- assembly
def _make_module(name, **attrs):
    mod = types.ModuleType(name)
    for key, value in attrs.items():
        setattr(mod, key, value)
    sys.modules[name] = mod
    return mod


def _identity_decorator_factory(*dargs, **dkwargs):
    def wrap(fn):
        return fn

    return wrap


def install_stubs() -> None:
    """Install stand-in modules for the reference's external dependencies."""
    if "mmcv" in sys.modules and getattr(sys.modules["mmcv"], "__rcf_stub__", False):
        return

    mmcv = _make_module(
        "mmcv",
        imresize=_imresize, imrescale=_imrescale, imflip=_imflip,
        imnormalize=_imnormalize, impad=_impad, impad_to_multiple=_impad_to_multiple,
        is_list_of=_is_list_of,
    )
    mmcv.__rcf_stub__ = True
    mmcv.cnn = _make_module(
        "mmcv.cnn",
        ConvModule=_ConvModule, build_conv_layer=_build_conv_layer,
        build_norm_layer=_build_norm_layer, build_plugin_layer=_build_plugin_layer,
        constant_init=_constant_init, kaiming_init=_kaiming_init,
        normal_init=_normal_init,
    )
    mmcv.runner = _make_module(
        "mmcv.runner",
        load_checkpoint=lambda *a, **k: (_ for _ in ()).throw(
            NotImplementedError("load_checkpoint stub")),
        auto_fp16=_identity_decorator_factory, force_fp32=_identity_decorator_factory,
    )
    mmcv.utils = _make_module("mmcv.utils")
    mmcv.utils.parrots_wrapper = _make_module(
        "mmcv.utils.parrots_wrapper", _BatchNorm=nn.modules.batchnorm._BatchNorm)
    mmcv.image = _make_module("mmcv.image")
    mmcv.image.colorspace = _make_module(
        "mmcv.image.colorspace", convert_color_factory=_convert_color_factory)

    mmseg = _make_module("mmseg")
    mmseg.ops = _make_module("mmseg.ops", resize=_resize)
    mmseg.core = _make_module(
        "mmseg.core",
        build_pixel_sampler=lambda *a, **k: (_ for _ in ()).throw(
            NotImplementedError("pixel sampler unused by RCF configs")),
    )

    tv = _make_module("torchvision")
    tv.utils = _make_module(
        "torchvision.utils", save_image=lambda *a, **k: None)
    tv.transforms = _make_module("torchvision.transforms")

    class _Compose:
        def __init__(self, transforms):
            self.transforms = transforms

        def __call__(self, data):
            for t in self.transforms:
                data = t(data)
            return data

    def _tf_normalize(tensor, mean, std, inplace=False):
        if not inplace:
            tensor = tensor.clone()
        mean = torch.as_tensor(mean, dtype=tensor.dtype)
        std = torch.as_tensor(std, dtype=tensor.dtype)
        return tensor.sub_(mean[:, None, None]).div_(std[:, None, None])

    tv.transforms.Compose = _Compose
    tv.transforms.functional = _make_module(
        "torchvision.transforms.functional", normalize=_tf_normalize)

    plight = _make_module("pytorch_lightning")
    plight.utilities = _make_module(
        "pytorch_lightning.utilities", rank_zero_only=lambda fn: fn)

    def _flow_to_color(flow, convert_to_bgr=False):
        # Only used by visualization paths the golden tests never exercise.
        h, w = flow.shape[:2]
        return np.zeros((h, w, 3), np.uint8)

    _make_module("flow_vis", flow_to_color=_flow_to_color)
    _make_module("torchcrf_cpp")  # CRFHead imports it at module level.
    pyd = _make_module("pydensecrf")
    pyd.densecrf = _make_module("pydensecrf.densecrf")

    # The reference hard-codes .cuda() at module init (e.g. the affine
    # coord_map, flow_aggregation_head_with_residual.py:143-146, and the EMA
    # copies, rcf_model.py:170,186). Torch here is CPU-only; make .cuda() an
    # identity so the math runs unchanged on host.
    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self


def load_reference():
    """sys.path-insert /root/reference and import its modules (cached).

    Returns a namespace with: utils, warp_utils, loss_utils, model_utils,
    transforms (dataset), models (package), rcf_model, flow_head, fcn_head,
    resnet, compactness_head, loss_blocks, flow_loss, pwc_lite,
    correlation_native, dino_vit, amd_model.
    """
    if _loaded:
        return _loaded["ns"]
    install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    import importlib

    ns = types.SimpleNamespace()
    ns.utils = importlib.import_module("utils")
    ns.warp_utils = importlib.import_module("utils.warp_utils")
    ns.loss_utils = importlib.import_module("utils.loss_utils")
    ns.model_utils = importlib.import_module("utils.model_utils")
    ns.eval_utils = importlib.import_module("utils.eval_utils")
    ns.transforms = importlib.import_module("dataset.transforms")
    ns.models = importlib.import_module("models")
    ns.rcf_model = importlib.import_module("models.rcf_model")
    ns.flow_head = importlib.import_module(
        "models.flow_aggregation_head_with_residual")
    ns.fcn_head = importlib.import_module("models.fcn_head")
    ns.resnet = importlib.import_module("models.resnet")
    ns.compactness_head = importlib.import_module("models.compactness_head")
    ns.loss_blocks = importlib.import_module("models.amd.loss_blocks")
    ns.flow_loss = importlib.import_module("models.amd.flow_loss")
    ns.pwc_lite = importlib.import_module("models.amd.pwc_lite")
    ns.correlation_native = importlib.import_module("models.amd.correlation_native")
    ns.dino_vit = importlib.import_module("models.dino_vit")
    ns.amd_model = importlib.import_module("models.amd.amd_model")
    _loaded["ns"] = ns
    return ns
