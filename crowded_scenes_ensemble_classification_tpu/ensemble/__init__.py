from .evaluate import (  # noqa: F401
    EnsembleResults,
    FoldResult,
    combine_ensembles,
    compute_combinations,
    evaluate_ensembles,
    global_evaluate_ensembles,
    save_global_predictions_csv,
)
from .fusion import (  # noqa: F401
    MAXIMUM,
    compute_weights,
    differential_evolution_weights,
    ensemble_accuracy,
    fuse_predictions,
    grid_search_weights,
    normalize_l1,
    single_model_predictions,
    sum_weights,
    validation_error_inverse_weights,
)
from .members import (  # noqa: F401
    make_member_forward,
    member_probabilities,
    shard_stacked,
    stack_variables,
)
from .probability_store import (  # noqa: F401
    export_reference_csv,
    import_reference_csv,
    load_probabilities,
    probabilities_exist,
    probability_cache_path,
    save_probabilities,
)
