from .export import (  # noqa: F401
    export_ensemble,
    load_serving_artifact,
    save_serving_artifact,
    serving_batch_example,
)
