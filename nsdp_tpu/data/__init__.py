"""Host-side data pipeline.

Dataset registry mirrors the reference (``dataset/__init__.py:5-10``):
``deform4d`` / ``deformtransfer`` / ``tosca`` / ``dogrec`` (the last two share
the user-handle dataset class).
"""

from nsdp_tpu.data.datasets import (
    Deform4DFlowDataset,
    DeformTransferFlowDataset,
    DeformUserhandleDataset,
)
from nsdp_tpu.data.loader import DataLoader

dataset_dict = {
    "deform4d": Deform4DFlowDataset,
    "deformtransfer": DeformTransferFlowDataset,
    "tosca": DeformUserhandleDataset,
    "dogrec": DeformUserhandleDataset,
}

__all__ = [
    "dataset_dict",
    "Deform4DFlowDataset",
    "DeformTransferFlowDataset",
    "DeformUserhandleDataset",
    "DataLoader",
]
