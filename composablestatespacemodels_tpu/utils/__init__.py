from . import checkpoint, data, io, streaming
from .checkpoint import restore_checkpoint, save_checkpoint
from .data import (SimulatedData, TimeSeries, simulate, simulate_lgcp,
                   simulate_regular, simulate_sde_grid)
from .io import (read_params_json, read_posterior_json, read_timeseries_csv,
                 read_timeseries_json, write_params_json,
                 write_posterior_json, write_timeseries_csv,
                 write_timeseries_json)
from .streaming import OnlineFilter, ascii_histogram, pmmh_monitored

__all__ = [
    "data", "io", "streaming", "checkpoint",
    "TimeSeries", "SimulatedData", "simulate", "simulate_regular",
    "simulate_sde_grid", "simulate_lgcp",
    "read_timeseries_csv", "write_timeseries_csv", "read_timeseries_json",
    "write_timeseries_json", "read_params_json", "write_params_json",
    "read_posterior_json", "write_posterior_json",
    "OnlineFilter", "pmmh_monitored", "ascii_histogram",
    "save_checkpoint", "restore_checkpoint",
]
