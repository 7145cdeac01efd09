"""Native (C++) runtime tier: high-throughput host-side IO.

Compiled on first use with the system toolchain and bound through ctypes
(no pybind11 dependency); everything degrades gracefully to the pure-Python
implementations in :mod:`..utils.io` when no compiler is available.
"""

from .loader import (available, parse_timeseries_csv, parse_timeseries_json,
                     write_matrix_csv, write_timeseries_csv)

__all__ = ["available", "parse_timeseries_csv", "parse_timeseries_json",
           "write_matrix_csv", "write_timeseries_csv"]
