from cstp_tpu.data.loader import (  # noqa: F401
    PretrainLoader,
    FinetuneLoader,
    prefetch_to_device,
)
from cstp_tpu.data.synthetic import SyntheticVideoDataset  # noqa: F401
from cstp_tpu.data.framedir import FrameDirDataset  # noqa: F401
