from cstp_tpu.ssl.byol import (  # noqa: F401
    CSTPPretrain,
    CSTPClassify,
    byol_regression_loss,
    ema_update,
    cross_entropy,
)
