from vq_seg_tpu.data.dataset import (  # noqa: F401
    BaseDataset,
    FolderDataset,
    NormalizedDataset,
    OBIADataset,
    SalientDataset,
    Loader,
)
