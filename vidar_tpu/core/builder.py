"""Config-driven model/dataset construction (the mmcv Registry +
``build_from_cfg`` contract, SURVEY §5: registry-based instantiation is the
reference's public config API — ``type`` leaf selects the class, the rest are
kwargs)."""

from __future__ import annotations

import copy
from typing import Any, Callable, Dict

MODELS: Dict[str, Callable] = {}
DATASETS: Dict[str, Callable] = {}


def _model_registry():
    if MODELS:
        return MODELS
    from ..models import (ViDAR, BEVFormer, BEVFormerFP16, BEVFormerV2)
    from ..uniad import UniAD, UniADTrack
    MODELS.update(ViDAR=ViDAR, BEVFormer=BEVFormer,
                  BEVFormer_fp16=BEVFormerFP16, BEVFormerFP16=BEVFormerFP16,
                  BEVFormerV2=BEVFormerV2, UniAD=UniAD,
                  UniADTrack=UniADTrack)
    return MODELS


def _dataset_registry():
    if DATASETS:
        return DATASETS
    from ..data.nuscenes import NuScenesViDARDataset, NuScenesDetDataset
    from ..data.nuplan import NuPlanViDARDataset
    from ..data.uniad_data import UniADDataset
    DATASETS.update(
        NuScenesViDARDatasetV1=NuScenesViDARDataset,
        NuScenesViDARDataset=NuScenesViDARDataset,
        CustomNuScenesDataset=NuScenesDetDataset,
        NuScenesDetDataset=NuScenesDetDataset,
        NuPlanViDARDatasetV1=NuPlanViDARDataset,
        NuPlanViDARDataset=NuPlanViDARDataset,
        UniADDataset=UniADDataset,
    )
    return DATASETS


def _normalize(cfg: Dict[str, Any], *, drop=('type',)) -> Dict[str, Any]:
    # underscore leaves are runtime flags read by the CLIs
    # (e.g. _submission / _submission_path / _viz_pcd_flag), not ctor kwargs
    out = {k: copy.deepcopy(v) for k, v in dict(cfg).items()
           if not k.startswith('_')}
    for k in drop:
        out.pop(k, None)
    # configs use lists (py literals); flax static fields need hashables
    for k, v in out.items():
        if isinstance(v, list):
            out[k] = tuple(tuple(e) if isinstance(e, list) else e for e in v)
    return out


def build_model(model_cfg: Dict[str, Any], **overrides):
    """Instantiate the detector named by ``model_cfg['type']``
    (default ViDAR)."""
    reg = _model_registry()
    name = model_cfg.get('type', 'ViDAR')
    if name not in reg:
        raise KeyError(f'unknown model type {name!r}; have {sorted(reg)}')
    kwargs = _normalize(model_cfg)
    kwargs.update(overrides)
    return reg[name](**kwargs)


def build_dataset(data_cfg: Dict[str, Any], **overrides):
    reg = _dataset_registry()
    name = data_cfg.get('type', 'NuScenesViDARDataset')
    if name not in reg:
        raise KeyError(f'unknown dataset type {name!r}; have {sorted(reg)}')
    kwargs = _normalize(data_cfg)
    # dataset kwargs stay as plain python (host-side); only drop registry key
    kwargs = {k: (list(v) if isinstance(v, tuple) and k == 'classes' else v)
              for k, v in kwargs.items()}
    kwargs.update(overrides)
    return reg[name](**kwargs)
