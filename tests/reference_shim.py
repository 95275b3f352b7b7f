"""Import the reference (PyTorch) EdgeCape head modules as EXECUTABLE
goldens.

The strongest parity instrument available offline: rather than re-deriving
the reference math in test code (which can share a misunderstanding with
the implementation), this loads the actual reference sources at
/root/reference/EdgeCape/models/{keypoint_heads,utils}/*.py with minimal
stub shims for their heavyweight deps (mmcv / mmpose / fairseq /
torchvision — none installed here). Stubs only provide trivial glue the
reference files import (registries, xavier_init, nn aliases, F.interpolate
wrapper, fairseq softmax/dropout passthroughs, torchvision.ops.MLP); ALL
model math executes reference code.

Import strategy: synthetic namespace packages with __path__ pointed at the
reference tree, so `EdgeCape.models.keypoint_heads.encoder_decoder` loads
without executing the reference package __init__ chain (which pulls in
datasets/apis we don't need and can't satisfy).
"""

from __future__ import annotations

import importlib
import sys
import types

REF_ROOT = "/root/reference"

_loaded = None


def _make_module(name: str, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _ensure_module(name: str, **attrs):
    """Get-or-create a stub module, adding `attrs` without clobbering an
    existing module's other attributes (the shim loaders compose)."""
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def load_reference():
    """Install stubs and import the reference head modules (cached)."""
    global _loaded
    if _loaded is not None:
        return _loaded

    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    # ------------------------------------------------------------- mmcv
    def xavier_init(module, gain=1, bias=0, distribution="normal"):
        if distribution == "uniform":
            nn.init.xavier_uniform_(module.weight, gain=gain)
        else:
            nn.init.xavier_normal_(module.weight, gain=gain)
        if hasattr(module, "bias") and module.bias is not None:
            nn.init.constant_(module.bias, bias)

    class Registry:
        def __init__(self, name):
            self.name = name
            self.module_dict = {}

        def register_module(self, name=None, module=None, force=False):
            if module is not None:
                self.module_dict[name or module.__name__] = module
                return module

            def deco(cls):
                self.module_dict[name or cls.__name__] = cls
                return cls

            return deco

        def get(self, key):
            return self.module_dict[key]

    def build_from_cfg(cfg, registry, default_args=None):
        args = dict(cfg)
        for k, v in (default_args or {}).items():
            args.setdefault(k, v)
        cls = registry.get(args.pop("type"))
        return cls(**args)

    class BaseModule(nn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()
            self.init_cfg = init_cfg

    POSITIONAL_ENCODING = Registry("position encoding")

    def build_positional_encoding(cfg, default_args=None):
        return build_from_cfg(cfg, POSITIONAL_ENCODING, default_args)

    mmcv = _make_module("mmcv")
    mmcv_cnn = _make_module("mmcv.cnn", xavier_init=xavier_init,
                            Conv2d=nn.Conv2d, Linear=nn.Linear)
    _make_module("mmcv.cnn.bricks")
    _make_module("mmcv.cnn.bricks.transformer",
                 POSITIONAL_ENCODING=POSITIONAL_ENCODING,
                 build_positional_encoding=build_positional_encoding)
    _make_module("mmcv.utils", Registry=Registry,
                 build_from_cfg=build_from_cfg)
    _make_module("mmcv.runner", BaseModule=BaseModule)
    mmcv.cnn = mmcv_cnn

    # ----------------------------------------------------------- mmpose
    HEADS = Registry("heads")

    class _Builder:
        @staticmethod
        def build_head(cfg, default_args=None):
            return build_from_cfg(cfg, HEADS, default_args)

    def keypoint_pck_accuracy(pred, gt, mask, thr, normalize):
        raise NotImplementedError("stub: not used by the goldens")

    def transform_preds(coords, center, scale, output_size, use_udp=False):
        raise NotImplementedError("stub: not used by the goldens")

    def resize(input, size=None, scale_factor=None, mode="nearest",
               align_corners=None, warning=True):
        return F.interpolate(input, size, scale_factor, mode, align_corners)

    _make_module("mmpose")
    _make_module("mmpose.models", HEADS=HEADS, builder=_Builder)
    _make_module("mmpose.models.builder", build_head=_Builder.build_head)
    _make_module("mmpose.models.utils")
    _make_module("mmpose.models.utils.ops", resize=resize)
    _make_module("mmpose.core")
    _make_module("mmpose.core.evaluation",
                 keypoint_pck_accuracy=keypoint_pck_accuracy)
    _make_module("mmpose.core.post_processing",
                 transform_preds=transform_preds)

    # ---------------------------------------------------------- fairseq
    def fairseq_softmax(x, dim, onnx_trace=False):
        return F.softmax(x, dim=dim)

    class FairseqDropout(nn.Module):
        def __init__(self, p, module_name=None):
            super().__init__()
            self.p = p

        def forward(self, x):
            return F.dropout(x, p=self.p, training=self.training)

    def quant_noise(module, p, block_size):
        assert p == 0.0, "stub only supports p=0 (reference default)"
        return module

    _make_module("fairseq", utils=types.SimpleNamespace(
        softmax=fairseq_softmax))
    _make_module("fairseq.modules")
    _make_module("fairseq.modules.fairseq_dropout",
                 FairseqDropout=FairseqDropout)
    _make_module("fairseq.modules.quant_noise", quant_noise=quant_noise)

    # ------------------------------------------------------ torchvision
    class MLP(nn.Sequential):
        """torchvision.ops.MLP layout (Linear/act/Dropout per hidden +
        final Linear/Dropout) — param indices 0, 3 for [in, h, out]."""

        def __init__(self, in_channels, hidden_channels, norm_layer=None,
                     activation_layer=nn.ReLU, inplace=None, bias=True,
                     dropout=0.0):
            layers = []
            in_dim = in_channels
            for hidden_dim in hidden_channels[:-1]:
                layers.append(nn.Linear(in_dim, hidden_dim, bias=bias))
                if norm_layer is not None:
                    layers.append(norm_layer(hidden_dim))
                layers.append(activation_layer())
                layers.append(nn.Dropout(dropout))
                in_dim = hidden_dim
            layers.append(nn.Linear(in_dim, hidden_channels[-1], bias=bias))
            layers.append(nn.Dropout(dropout))
            super().__init__(*layers)

    _make_module("torchvision", ops=types.SimpleNamespace(MLP=MLP))
    _make_module("torchvision.ops", MLP=MLP)

    # ------------------------- namespace packages over the reference tree
    for name, path in [
            ("EdgeCape", f"{REF_ROOT}/EdgeCape"),
            ("EdgeCape.models", f"{REF_ROOT}/EdgeCape/models"),
            ("EdgeCape.models.utils", f"{REF_ROOT}/EdgeCape/models/utils"),
            ("EdgeCape.models.keypoint_heads",
             f"{REF_ROOT}/EdgeCape/models/keypoint_heads")]:
        pkg = types.ModuleType(name)
        pkg.__path__ = [path]
        sys.modules[name] = pkg

    bias_attn = importlib.import_module("EdgeCape.models.utils.bias_attn")
    builder = importlib.import_module("EdgeCape.models.utils.builder")
    posenc = importlib.import_module(
        "EdgeCape.models.utils.positional_encoding")
    # head.py does `from EdgeCape.models.utils import build_transformer`
    sys.modules["EdgeCape.models.utils"].build_transformer = \
        builder.build_transformer
    # head.py builds the transformer from its registry
    enc_dec = importlib.import_module(
        "EdgeCape.models.keypoint_heads.encoder_decoder")
    skeleton = importlib.import_module(
        "EdgeCape.models.keypoint_heads.skeleton")
    head = importlib.import_module("EdgeCape.models.keypoint_heads.head")

    _loaded = types.SimpleNamespace(
        torch=torch, enc_dec=enc_dec, skeleton=skeleton, head=head,
        bias_attn=bias_attn, posenc=posenc,
        SinePositionalEncoding=posenc.SinePositionalEncoding)
    return _loaded


def build_reference_head(model_cfg, *, learn_skeleton=False,
                         attn_bias=False, masked_supervision=False,
                         seed=0):
    """Construct the reference TwoStageHead with the shipped config layout
    (reference configs/train/1shot_split1.py:36-63), init, then re-randomize
    every parameter with a seeded generator so zero-initialized branches
    (kpt out layers, zero_conv, mask_token) still exercise nontrivial math.
    Returns (head.eval(), prefixed state_dict)."""
    ref = load_reference()
    torch = ref.torch
    c = model_cfg
    transformer = dict(
        type="TwoStageSupportRefineTransformer", d_model=c.d_model,
        nhead=c.nhead, num_encoder_layers=c.num_encoder_layers,
        num_decoder_layers=c.num_decoder_layers,
        dim_feedforward=c.dim_feedforward, dropout=c.dropout,
        similarity_proj_dim=c.similarity_proj_dim,
        dynamic_proj_dim=c.dynamic_proj_dim, max_hops=c.max_hops,
        attn_bias=attn_bias, use_bias_attn_module=attn_bias,
        masked_supervision=masked_supervision)
    skeleton_head = dict(
        type="SkeletonPredictor", learn_skeleton=learn_skeleton,
        d_model=c.d_model, nhead=c.nhead,
        num_layers=c.skeleton_num_layers,
        dim_feedforward=c.backbone_dim, dropout=c.dropout,
        adj_normalization=c.adj_normalization,
        use_zero_conv=c.use_zero_conv, max_hops=c.max_hops)
    h = ref.head.TwoStageHead(
        in_channels=c.backbone_dim, transformer=transformer,
        positional_encoding=dict(type="SinePositionalEncoding",
                                 num_feats=c.num_feats, normalize=True),
        num_decoder_layer=c.num_decoder_layers,
        learn_skeleton=learn_skeleton,
        masked_supervision=masked_supervision,
        skeleton_head=skeleton_head)
    h.init_weights()
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in h.parameters():
            p.copy_(torch.empty_like(p).normal_(0.0, 0.05, generator=gen))
    h.eval()
    sd = {"keypoint_head_module." + k: v for k, v in h.state_dict().items()}
    return h, sd


_pipeline_mod = None


def load_reference_pipeline():
    """Import the reference datasets/pipelines/top_down_transform.py as an
    executable golden for the target generators (MSRA multi-sigma, UDP
    GaussianHeatMap/CombinedTarget). Reuses load_reference()'s stub
    strategy; only registry/unused-function glue is stubbed."""
    global _pipeline_mod
    if _pipeline_mod is not None:
        return _pipeline_mod
    load_reference()  # installs the mmcv/mmpose stub base

    mmcv = sys.modules["mmcv"]
    if not hasattr(mmcv, "fileio"):
        mmcv.fileio = _make_module("mmcv.fileio")
    reg = sys.modules["mmcv.utils"].Registry
    PIPELINES = reg("pipelines")
    _ensure_module("mmpose.datasets")
    _ensure_module("mmpose.datasets.builder", PIPELINES=PIPELINES)

    def _unused(*a, **k):
        raise NotImplementedError("stub: not used by target generators")

    pp = sys.modules["mmpose.core.post_processing"]
    for fn in ("affine_transform", "fliplr_joints", "get_affine_transform",
               "get_warp_matrix", "warp_affine_joints"):
        if not hasattr(pp, fn):
            setattr(pp, fn, _unused)

    for name, path in [
            ("EdgeCape.datasets", f"{REF_ROOT}/EdgeCape/datasets"),
            ("EdgeCape.datasets.pipelines",
             f"{REF_ROOT}/EdgeCape/datasets/pipelines")]:
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [path]
            sys.modules[name] = pkg

    _pipeline_mod = importlib.import_module(
        "EdgeCape.datasets.pipelines.top_down_transform")
    return _pipeline_mod


_datasets_mod = None


def load_reference_datasets():
    """Import the reference MP-100 dataset classes (TransformerPoseDataset,
    TestPoseDataset and their bases) as EXECUTABLE goldens for the episodic
    protocol: db construction, class-balanced train pairing, seeded
    val/test episode generation, and `evaluate()` (mask construction, bbox
    thresholds, sort/unique, metric aggregation).

    Stub policy (same as load_reference): only external glue is stubbed —
    xtcocotools.coco.COCO backed by edgecape_tpu.data.coco.CocoIndex,
    json_tricks by stdlib json, the mmpose metric KERNELS
    (keypoint_pck_accuracy/auc/epe/nme) by edgecape_tpu.eval.metrics (their
    mmpose-faithful per-sample forms). Everything protocol-shaped —
    sampling order, seeding, masks, thresholds, aggregation — executes
    reference code from
    /root/reference/EdgeCape/datasets/datasets/mp100/*.py.
    """
    global _datasets_mod
    if _datasets_mod is not None:
        return _datasets_mod
    load_reference()  # installs the mmcv/mmpose stub base

    import json as _stdjson

    from edgecape_tpu.data.coco import CocoIndex
    from edgecape_tpu.eval import metrics as _m

    # ------------------------------------------------------- json_tricks
    _ensure_module("json_tricks", dump=_stdjson.dump, load=_stdjson.load,
                   dumps=_stdjson.dumps, loads=_stdjson.loads)

    # ----------------------------------------------------- mmcv.parallel
    class DataContainer:
        def __init__(self, data, cpu_only=False, stack=False):
            self._data = data
            self.cpu_only = cpu_only
            self.stack = stack

        @property
        def data(self):
            return self._data

    _ensure_module("mmcv.parallel", DataContainer=DataContainer)
    sys.modules["mmcv"].parallel = sys.modules["mmcv.parallel"]

    # ------------------------------------- mmpose metric kernels + glue
    _ensure_module("mmpose.core.evaluation.top_down_eval",
                   keypoint_pck_accuracy=_m.pck_accuracy,
                   keypoint_auc=_m.auc, keypoint_epe=_m.epe,
                   keypoint_nme=_m.nme)
    Registry = sys.modules["mmcv.utils"].Registry
    DATASETS = Registry("datasets")

    class Compose:
        """Identity pipeline stub: the goldens exercise db/episodes/
        evaluate(), never __getitem__ (the pipeline stages have their own
        executable goldens via load_reference_pipeline)."""

        def __init__(self, transforms):
            self.transforms = transforms

        def __call__(self, data):
            return data

    _ensure_module("mmpose.datasets", DATASETS=DATASETS)
    _ensure_module("mmpose.datasets.pipelines", Compose=Compose)

    # ------------------------------ xtcocotools backed by data/coco.py
    class COCO:
        """xtcocotools.coco.COCO API over CocoIndex — iteration orders
        (file order for imgs/cats, per-image ann file order) match the
        real COCO API, which the episode-parity tests rely on."""

        def __init__(self, ann_file):
            self._idx = CocoIndex(ann_file)
            self.imgs = self._idx.imgs
            self.cats = self._idx.cats
            self.anns = self._idx.anns
            self.dataset = self._idx.dataset

        def getImgIds(self):
            return self._idx.get_img_ids()

        def getCatIds(self):
            return self._idx.get_cat_ids()

        def loadCats(self, ids):
            if not isinstance(ids, (list, tuple)):
                ids = [ids]
            return [self.cats[i] for i in ids]

        def loadImgs(self, ids):
            if not isinstance(ids, (list, tuple)):
                ids = [ids]
            return [self.imgs[i] for i in ids]

        def getAnnIds(self, imgIds=None, iscrowd=None):
            if imgIds is None:
                imgIds = self.getImgIds()
            elif not isinstance(imgIds, (list, tuple)):
                imgIds = [imgIds]
            out = []
            for i in imgIds:
                out.extend(a["id"]
                           for a in self._idx.img_anns(i, iscrowd=iscrowd))
            return out

        def loadAnns(self, ids):
            if not isinstance(ids, (list, tuple)):
                ids = [ids]
            return [self.anns[i] for i in ids]

    _ensure_module("xtcocotools", coco=_ensure_module("xtcocotools.coco",
                                                      COCO=COCO))

    # ------------------------- namespace packages over the reference tree
    for name, path in [
            ("EdgeCape.datasets", f"{REF_ROOT}/EdgeCape/datasets"),
            ("EdgeCape.datasets.datasets",
             f"{REF_ROOT}/EdgeCape/datasets/datasets"),
            ("EdgeCape.datasets.datasets.mp100",
             f"{REF_ROOT}/EdgeCape/datasets/datasets/mp100")]:
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [path]
            sys.modules[name] = pkg

    tdm = importlib.import_module(
        "EdgeCape.datasets.datasets.mp100.transformer_dataset")
    tsm = importlib.import_module(
        "EdgeCape.datasets.datasets.mp100.test_dataset")

    _datasets_mod = types.SimpleNamespace(
        TransformerPoseDataset=tdm.TransformerPoseDataset,
        TestPoseDataset=tsm.TestPoseDataset, COCO=COCO)
    return _datasets_mod
