"""The pooling-head zoo (reference: poolings/*)."""
from .abmilp import ABMILPHead
from .aim import AIMAttentionPooling
from .cae import CAEAttentiveBlock
from .cait import CaiTPooling
from .cbam import CbamPooling
from .clip_pool import CLIPAttentionPool2d, SigLIPAttentionPool
from .coca import CoCaCrossAttnPooling
from .dinovit import DinoViTBlockPooling
from .dolg import DOLGSpatialAttention
from .ep import EfficientProbing
from .jepa import JEPAAttentivePooler
from .registry import ProbeHead, build_pooling, head_in_features, base_name
from .simpool import SimPool, SimPoolNoLinears

__all__ = [
    "ABMILPHead", "AIMAttentionPooling", "CAEAttentiveBlock", "CaiTPooling",
    "CbamPooling", "CLIPAttentionPool2d", "SigLIPAttentionPool",
    "CoCaCrossAttnPooling", "DinoViTBlockPooling", "DOLGSpatialAttention",
    "EfficientProbing", "JEPAAttentivePooler", "ProbeHead", "SimPool",
    "SimPoolNoLinears", "build_pooling", "head_in_features", "base_name",
]
