from .signal import (
    gauss_model,
    gauss_rician_model,
    make_objective,
    predict_signal,
    MODEL_NAMES,
)
from .init import loglinear_init, grid_init
from .solver import (
    fit_batch,
    fit_batch_multistart,
    fit_batch_traced,
    fit_batch_twophase,
    FitResult,
)
from .pallas_fit import fit_fused
from .volume_fit import fit_volume, VolumeFitResult
from .t2map import fit_stack, T2FitOutput

__all__ = [
    "gauss_model",
    "gauss_rician_model",
    "make_objective",
    "predict_signal",
    "MODEL_NAMES",
    "loglinear_init",
    "grid_init",
    "fit_batch",
    "fit_batch_multistart",
    "fit_batch_traced",
    "fit_batch_twophase",
    "FitResult",
    "fit_fused",
    "fit_volume",
    "VolumeFitResult",
    "fit_stack",
    "T2FitOutput",
]
