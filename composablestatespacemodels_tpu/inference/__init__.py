from . import filter as filter_mod
from . import kalman, resampling
from .filter import (FilterResult, Forecast, PfSummary, bootstrap_filter,
                     credible_interval_eta, credible_interval_state, forecast,
                     forecast_times, log_likelihood)
from .kalman import KalmanResult, kalman_filter
from .resampling import (effective_sample_size, exp_normalise,
                         identity_indices, multinomial_indices, resample,
                         residual_indices, stratified_indices,
                         systematic_indices)

__all__ = [
    "resampling", "kalman",
    "bootstrap_filter", "log_likelihood", "FilterResult", "PfSummary",
    "Forecast", "forecast", "forecast_times",
    "credible_interval_eta", "credible_interval_state",
    "kalman_filter", "KalmanResult",
    "systematic_indices", "stratified_indices", "multinomial_indices",
    "residual_indices", "identity_indices", "resample",
    "effective_sample_size", "exp_normalise",
]
