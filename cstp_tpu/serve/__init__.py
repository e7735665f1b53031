from cstp_tpu.serve.export import (  # noqa: F401
    ServingModel,
    export_serving_artifact,
    save_serving_artifact,
)
