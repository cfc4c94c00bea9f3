"""Import RUNNABLE reference torch modules with their mmengine/mmcv deps
stubbed (VERDICT r2 next-round #3).

The reference repo at ``/root/reference`` depends on mmengine/mmcv/mmseg/
nerfstudio/nerfacc — none installed here — but its loss math, the
``BEVDeformableAttention`` forward and the ``BEVNeRF`` field are plain torch
underneath. This shim installs ~100 lines of registry/BaseModule/msda-fallback
stubs into ``sys.modules`` so those files import unmodified, giving golden
oracles that run the reference's OWN code (not a re-transcription).

Packages are stubbed with ``__path__`` pointing at the real directories so
submodules load WITHOUT executing the heavy package ``__init__``s
(``model/__init__.py`` pulls nerfstudio/mmseg).
"""
import importlib
import importlib.util
import os
import sys
import types

REF_ROOT = "/root/reference"


def reference_available():
    return os.path.isdir(REF_ROOT)


def _module(name, **attrs):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _pkg_stub(name, path):
    mod = _module(name)
    mod.__path__ = [path]
    return mod


def multi_scale_deformable_attn_pytorch(value, spatial_shapes,
                                        sampling_locations,
                                        attention_weights):
    """mmcv's pure-pytorch MSDA fallback semantics: per-level
    ``grid_sample(align_corners=False, zeros)`` + weighted reduction.
    Same math as ``tests/test_msda.torch_msda`` (kept in both places so the
    shim has no test-module import)."""
    import torch
    import torch.nn.functional as F
    bs, _, num_heads, d = value.shape
    _, nq, _, nl, np_, _ = sampling_locations.shape
    value_list = value.split([int(h) * int(w) for h, w in spatial_shapes],
                             dim=1)
    sampling_grids = 2 * sampling_locations - 1
    out = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value_list[lvl].flatten(2).transpose(1, 2).reshape(
            bs * num_heads, d, int(h), int(w))
        g = sampling_grids[:, :, :, lvl].transpose(1, 2).flatten(0, 1)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                          align_corners=False)
        out.append(s)
    att = attention_weights.transpose(1, 2).reshape(
        bs * num_heads, 1, nq, nl * np_)
    res = (torch.stack(out, dim=-2).flatten(-2) * att).sum(-1)
    return res.view(bs, num_heads * d, nq).transpose(1, 2).contiguous()


def install_shims():
    """Idempotent: install mmengine/mmcv/utils.tb_wrapper stubs and the
    reference package path stubs into ``sys.modules``."""
    if "mmengine" in sys.modules and hasattr(sys.modules["mmengine"],
                                             "_selfocc_shim"):
        return
    import torch.nn as nn

    class Registry:
        def __init__(self, name, **kw):
            self._name = name
            self._mods = {}

        def register_module(self, *args, **kw):
            if args and isinstance(args[0], type):
                self._mods[args[0].__name__] = args[0]
                return args[0]

            def deco(cls):
                self._mods[kw.get("name", cls.__name__)] = cls
                return cls
            return deco

        def get(self, key):
            return self._mods[key]

        def build(self, cfg, **extra):
            cfg = dict(cfg)
            cls = self._mods[cfg.pop("type")]
            return cls(**cfg, **extra)

    MODELS = Registry("model")

    class BaseModule(nn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()
            self.init_cfg = init_cfg

        def init_weights(self):
            pass

    def xavier_init(module, gain=1, bias=0, distribution="normal"):
        if distribution == "uniform":
            nn.init.xavier_uniform_(module.weight, gain=gain)
        else:
            nn.init.xavier_normal_(module.weight, gain=gain)
        if getattr(module, "bias", None) is not None:
            nn.init.constant_(module.bias, bias)

    def constant_init(module, val, bias=0):
        if getattr(module, "weight", None) is not None:
            nn.init.constant_(module.weight, val)
        if getattr(module, "bias", None) is not None:
            nn.init.constant_(module.bias, bias)

    class ManagerMixin:
        _instance_dict = {}

        def __init__(self, name="", **kw):
            pass

    def _mm_load(path):
        # mmengine.load dispatches on extension; the reference only loads
        # pickle info files
        import pickle
        with open(path, "rb") as f:
            return pickle.load(f)

    mm = _module("mmengine", ConfigDict=dict, _selfocc_shim=True,
                 load=_mm_load)
    mm.registry = _module("mmengine.registry", Registry=Registry,
                          MODELS=MODELS)
    mm.model = _module("mmengine.model", BaseModule=BaseModule,
                       ModuleList=nn.ModuleList,
                       xavier_init=xavier_init, constant_init=constant_init)
    def deprecated_api_warning(name_dict, cls_name=None):
        def deco(fn):
            return fn
        return deco

    mm.utils = _module("mmengine.utils", ManagerMixin=ManagerMixin,
                       deprecated_api_warning=deprecated_api_warning)
    class _DummyLogger:
        def info(self, *a, **k):
            pass

        warning = error = debug = info

    class MMLogger:
        @staticmethod
        def get_current_instance():
            return _DummyLogger()

        @staticmethod
        def get_instance(name, **kw):
            return _DummyLogger()

    mm.logging = _module("mmengine.logging", MMLogger=MMLogger)
    mm.MMLogger = MMLogger

    class MultiScaleDeformableAttnFunction:
        @staticmethod
        def apply(value, spatial_shapes, level_start_index,
                  sampling_locations, attention_weights, im2col_step):
            return multi_scale_deformable_attn_pytorch(
                value, spatial_shapes, sampling_locations, attention_weights)

    class MultiScaleDeformableAttention(BaseModule):
        """mmcv's MSDA module — weight container + the standard mmcv
        forward (query_pos add, value proj, softmax weights, per-level
        offset normalization, residual+dropout). The reference's
        CrossViewHybridAttention subclasses this and overrides forward (its
        logic stays the reference's own code); the BEVFormer variant's
        self-attn uses THIS forward directly
        (``config/nuscenes/nuscenes_occ_bev.py:221-228``). Layer layout
        mirrors mmcv.ops.multi_scale_deform_attn (the same layout
        utils/ref_import.py maps checkpoints from)."""

        def __init__(self, embed_dims=256, num_heads=8, num_levels=4,
                     num_points=4, im2col_step=64, dropout=0.1,
                     batch_first=False, norm_cfg=None, init_cfg=None,
                     value_proj_ratio=1.0):
            super().__init__(init_cfg)
            self.embed_dims = embed_dims
            self.num_heads = num_heads
            self.num_levels = num_levels
            self.num_points = num_points
            self.im2col_step = im2col_step
            self.batch_first = batch_first
            self.dropout = nn.Dropout(dropout)
            self.sampling_offsets = nn.Linear(
                embed_dims, num_heads * num_levels * num_points * 2)
            self.attention_weights = nn.Linear(
                embed_dims, num_heads * num_levels * num_points)
            vdim = int(embed_dims * value_proj_ratio)
            self.value_proj = nn.Linear(embed_dims, vdim)
            self.output_proj = nn.Linear(vdim, embed_dims)

        def forward(self, query, key=None, value=None, identity=None,
                    query_pos=None, key_padding_mask=None,
                    reference_points=None, spatial_shapes=None,
                    level_start_index=None, **kwargs):
            import torch
            if value is None:
                value = query
            if identity is None:
                identity = query
            if query_pos is not None:
                query = query + query_pos
            if not self.batch_first:
                query = query.permute(1, 0, 2)
                value = value.permute(1, 0, 2)
            bs, num_query, _ = query.shape
            bs, num_value, _ = value.shape
            value = self.value_proj(value)
            if key_padding_mask is not None:
                value = value.masked_fill(key_padding_mask[..., None], 0.0)
            value = value.view(bs, num_value, self.num_heads, -1)
            sampling_offsets = self.sampling_offsets(query).view(
                bs, num_query, self.num_heads, self.num_levels,
                self.num_points, 2)
            attention_weights = self.attention_weights(query).view(
                bs, num_query, self.num_heads,
                self.num_levels * self.num_points)
            attention_weights = attention_weights.softmax(-1).view(
                bs, num_query, self.num_heads, self.num_levels,
                self.num_points)
            assert reference_points.shape[-1] == 2
            offset_normalizer = torch.stack(
                [spatial_shapes[..., 1], spatial_shapes[..., 0]], -1)
            sampling_locations = (
                reference_points[:, :, None, :, None, :]
                + sampling_offsets
                / offset_normalizer[None, None, None, :, None, :])
            output = multi_scale_deformable_attn_pytorch(
                value, spatial_shapes, sampling_locations,
                attention_weights)
            output = self.output_proj(output)
            if not self.batch_first:
                output = output.permute(1, 0, 2)
            return self.dropout(output) + identity

    # the real mmcv registers MSDA as a buildable attention; the BEVFormer
    # layer config constructs it by type name
    MODELS.register_module(MultiScaleDeformableAttention)

    class FFN(BaseModule):
        """mmcv.cnn.bricks.transformer.FFN semantics: (num_fcs-1) x
        [Linear->act->Dropout] -> Linear -> Dropout, residual add (identity
        defaults to the input). Layer names match mmcv's Sequential layout
        (``layers.0.0`` first fc, ``layers.1`` last fc) so checkpoints and
        state_dict-based weight sharing line up."""

        def __init__(self, embed_dims=256, feedforward_channels=1024,
                     num_fcs=2, act_cfg=None, ffn_drop=0.0,
                     dropout_layer=None, add_identity=True, init_cfg=None,
                     **kw):
            super().__init__(init_cfg)
            layers = []
            in_ch = embed_dims
            for _ in range(num_fcs - 1):
                layers.append(nn.Sequential(
                    nn.Linear(in_ch, feedforward_channels),
                    nn.ReLU(inplace=True), nn.Dropout(ffn_drop)))
                in_ch = feedforward_channels
            layers.append(nn.Linear(feedforward_channels, embed_dims))
            layers.append(nn.Dropout(ffn_drop))
            self.layers = nn.Sequential(*layers)
            self.dropout_layer = nn.Identity()
            self.add_identity = add_identity

        def forward(self, x, identity=None):
            out = self.layers(x)
            if not self.add_identity:
                return self.dropout_layer(out)
            if identity is None:
                identity = x
            return identity + self.dropout_layer(out)

    def build_norm_layer(cfg, num_features):
        cfg = dict(cfg)
        t = cfg.pop("type", "LN")
        if t == "LN":
            return "ln", nn.LayerNorm(num_features)
        # registry norms (e.g. the reference's MultiPlaneNorm) take
        # num_features as their first positional (embed_dims)
        return t.lower(), MODELS.get(t)(num_features, **cfg)

    def build_feedforward_network(cfg):
        cfg = dict(cfg)
        t = cfg.pop("type", "FFN")
        if t == "FFN":
            return FFN(**cfg)
        return MODELS.get(t)(**cfg)

    # ---- mmcv top-level image ops (faithful reimplementations of
    # mmcv.image over cv2/numpy, used by the reference's transform_3d.py;
    # mmcv pads bottom/right, normalizes in-place via cv2.subtract/multiply
    # with float64 mean/stdinv, and resizes with cv2 bilinear) ----
    import cv2
    import numpy as np

    def impad(img, shape=None, pad_val=0, **kw):
        out = np.empty(tuple(shape) + img.shape[2:], img.dtype)
        out[...] = pad_val
        out[:img.shape[0], :img.shape[1]] = img
        return out

    def impad_to_multiple(img, divisor, pad_val=0):
        h = int(np.ceil(img.shape[0] / divisor)) * divisor
        w = int(np.ceil(img.shape[1] / divisor)) * divisor
        return impad(img, shape=(h, w), pad_val=pad_val)

    def imnormalize(img, mean, std, to_rgb=True):
        img = img.copy().astype(np.float32)
        mean = np.float64(np.asarray(mean).reshape(1, -1))
        stdinv = 1 / np.float64(np.asarray(std).reshape(1, -1))
        if to_rgb:
            cv2.cvtColor(img, cv2.COLOR_BGR2RGB, img)
        cv2.subtract(img, mean, img)
        cv2.multiply(img, stdinv, img)
        return img

    def imflip(img, direction="horizontal"):
        assert direction == "horizontal"
        return np.flip(img, axis=1)

    def imresize(img, size, return_scale=False, interpolation="bilinear"):
        assert interpolation == "bilinear"
        out = cv2.resize(img, size, interpolation=cv2.INTER_LINEAR)
        return (out, None, None) if return_scale else out

    mmcv = _module(
        "mmcv", _selfocc_shim=True,
        impad=impad, impad_to_multiple=impad_to_multiple,
        imnormalize=imnormalize, imflip=imflip, imresize=imresize,
        bgr2hsv=lambda im: cv2.cvtColor(im, cv2.COLOR_BGR2HSV),
        hsv2bgr=lambda im: cv2.cvtColor(im, cv2.COLOR_HSV2BGR))

    def _imread(path, flag="color"):
        # mmcv.image.io.imread cv2 backend: 'unchanged' = IMREAD_UNCHANGED
        flags = {"color": cv2.IMREAD_COLOR,
                 "unchanged": cv2.IMREAD_UNCHANGED,
                 "grayscale": cv2.IMREAD_GRAYSCALE}[flag]
        return cv2.imread(str(path), flags)

    mmcv.image = _module("mmcv.image")
    mmcv.image.io = _module("mmcv.image.io", imread=_imread)

    # pyquaternion (not installed): the reference only uses
    # Quaternion(wxyz).rotation_matrix, which normalizes first
    class Quaternion:
        def __init__(self, q):
            self.q = np.asarray(q, np.float64)

        @property
        def rotation_matrix(self):
            w, x, y, z = self.q / np.linalg.norm(self.q)
            return np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
                 2 * (x * z + y * w)],
                [2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
                 2 * (y * z - x * w)],
                [2 * (x * z - y * w), 2 * (y * z + x * w),
                 1 - 2 * (x * x + y * y)]])

    _module("pyquaternion", Quaternion=Quaternion)
    mmcv.cnn = _module("mmcv.cnn", build_norm_layer=build_norm_layer)
    mmcv.cnn.bricks = _module("mmcv.cnn.bricks")
    mmcv.cnn.bricks.transformer = _module(
        "mmcv.cnn.bricks.transformer",
        build_attention=lambda cfg: MODELS.build(cfg),
        build_positional_encoding=lambda cfg: MODELS.build(cfg),
        build_transformer_layer=lambda cfg: MODELS.build(cfg),
        build_feedforward_network=build_feedforward_network,
        FFN=FFN)
    mmcv.ops = _module("mmcv.ops")
    mmcv.ops.multi_scale_deform_attn = _module(
        "mmcv.ops.multi_scale_deform_attn",
        MultiScaleDeformableAttention=MultiScaleDeformableAttention,
        MultiScaleDeformableAttnFunction=MultiScaleDeformableAttnFunction,
        multi_scale_deformable_attn_pytorch=(
            multi_scale_deformable_attn_pytorch))
    mmcv.utils = _module("mmcv.utils", IS_CUDA_AVAILABLE=False,
                         IS_MLU_AVAILABLE=False)

    mmseg = _module("mmseg", _selfocc_shim=True)
    mmseg.registry = _module("mmseg.registry", MODELS=MODELS)

    # mmseg.models + mmdet3d.registry — enough for the reference's
    # CustomBaseSegmentor/TPVSegmentor to build from config dicts
    # (base_segmentor.py:1-32). One shared registry suffices: the reference
    # scatters registrations across SEGMENTORS/HEADS/MODELS but names never
    # collide.
    class _Builder:
        build_backbone = staticmethod(lambda cfg: MODELS.build(cfg))
        build_neck = staticmethod(lambda cfg: MODELS.build(cfg))
        build_head = staticmethod(lambda cfg: MODELS.build(cfg))

    mmseg.models = _module(
        "mmseg.models", SEGMENTORS=MODELS, HEADS=MODELS, MODELS=MODELS,
        builder=_Builder,
        build_backbone=lambda cfg: MODELS.build(cfg))
    mmdet3d = _module("mmdet3d", _selfocc_shim=True)
    mmdet3d.registry = _module("mmdet3d.registry", MODELS=MODELS)

    # nerfacc (not installed): construction-only stub. The reference's
    # NeRFAccHead imports it at module level (nerfacc_head.py:9) and its
    # CustomOccGridEstimator subclasses OccGridEstimator (estimator.py:1-8),
    # but the forward_occ / prepare / pre_compute paths exercised by goldens
    # never march rays, so the estimator just needs to build.
    import torch as _torch

    class _OccGridEstimator(nn.Module):
        def __init__(self, roi_aabb, resolution=128, levels=1, **kw):
            super().__init__()
            self.register_buffer(
                "aabbs", _torch.as_tensor(roi_aabb,
                                          dtype=_torch.float32).reshape(1, 6))

    def _na_unavailable(*a, **kw):
        raise NotImplementedError("nerfacc stub: ray marching not available")

    na = _module("nerfacc", OccGridEstimator=_OccGridEstimator,
                 render_weight_from_alpha=_na_unavailable,
                 render_weight_from_density=_na_unavailable,
                 accumulate_along_rays=_na_unavailable)
    na.grid = _module("nerfacc.grid", traverse_grids=_na_unavailable)

    # the reference's own utils package (tb writer singleton) — stub it so
    # `from utils.tb_wrapper import WrappedTBWriter` never imports
    # tensorboard / never collides with anything local
    class WrappedTBWriter:
        _instance_dict = {}

        @staticmethod
        def get_instance(name):
            return None

    u = _module("utils", _selfocc_shim=True)
    u.tb_wrapper = _module("utils.tb_wrapper", WrappedTBWriter=WrappedTBWriter)

    # reference packages WITHOUT executing their heavy __init__ chains:
    # stub the parents with __path__ at the real dirs, then normal import
    # machinery finds leaf modules underneath.
    for pkg, rel in [
            ("model", "model"),
            ("model.segmentor", "model/segmentor"),
            ("model.lifter", "model/lifter"),
            ("dataset", "dataset"),
            ("dataset.kitti", "dataset/kitti"),
            ("dataset.kitti_raw", "dataset/kitti_raw"),
            ("model.backbone", "model/backbone"),
            ("model.head", "model/head"),
            ("model.head.utils", "model/head/utils"),
            ("model.head.nerfacc_head", "model/head/nerfacc_head"),
            ("model.encoder", "model/encoder"),
            ("model.encoder.bevformer", "model/encoder/bevformer"),
            ("model.encoder.bevformer.attention",
             "model/encoder/bevformer/attention"),
            ("model.encoder.tpvformer", "model/encoder/tpvformer"),
            ("model.encoder.tpvformer.modules",
             "model/encoder/tpvformer/modules"),
    ]:
        _pkg_stub(pkg, os.path.join(REF_ROOT, rel))
    # dataset_wrapper_temporal.py does `from . import OPENOCC_DATAWRAPPER`
    # against the stubbed parent package (datasets likewise)
    sys.modules["dataset"].OPENOCC_DATAWRAPPER = Registry("data_wrapper")
    sys.modules["dataset"].OPENOCC_DATASET = Registry("dataset")
    # `loss` has a light __init__ (registry + loss imports) that must
    # actually execute — load it by explicit file path. NEVER put REF_ROOT
    # on sys.path: the reference's root-level module names (train,
    # eval_depth, eval_novel_depth_kitti, ...) collide with this repo's
    # drivers and would shadow them for every later test in the session.
    if "loss" not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            "loss", os.path.join(REF_ROOT, "loss", "__init__.py"),
            submodule_search_locations=[os.path.join(REF_ROOT, "loss")])
        mod = importlib.util.module_from_spec(spec)
        sys.modules["loss"] = mod
        spec.loader.exec_module(mod)


def load_ref(modname):
    """e.g. ``load_ref('loss')`` or
    ``load_ref('model.encoder.bevformer.attention.image_cross_attention')``."""
    install_shims()
    return importlib.import_module(modname)
