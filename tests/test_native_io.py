"""Native (C++) IO tier vs the pure-Python fallbacks."""

import numpy as np
import pytest

from composablestatespacemodels_tpu import TimeSeries, native
from composablestatespacemodels_tpu.utils import io as cio


@pytest.fixture(scope="module")
def big_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("io") / "big.csv"
    rng = np.random.default_rng(0)
    n = 50_000
    ts = np.cumsum(rng.uniform(0.1, 1.0, n))
    ys = rng.normal(size=n)
    miss = rng.uniform(size=n) < 0.1
    with open(path, "w") as f:
        for i in range(n):
            f.write(f"{ts[i]},{'' if miss[i] else ys[i]}\n")
    return str(path), ts, ys, miss


def test_native_available():
    # g++ is part of the baked toolchain; the native tier must build here
    assert native.available()


def test_native_csv_matches_python(big_file):
    path, ts, ys, miss = big_file
    got = cio.read_timeseries_csv(path)  # native path
    assert len(got) == len(ts)
    np.testing.assert_allclose(np.asarray(got.ts), ts, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.mask), ~miss)
    np.testing.assert_allclose(np.asarray(got.ys)[~miss], ys[~miss],
                               rtol=1e-6)


def test_native_csv_na_and_blank(tmp_path):
    p = str(tmp_path / "na.csv")
    with open(p, "w") as f:
        f.write("0.0,1.5\n\n1.0,NA\n2.0,\n3.0,4.0\n")
    back = cio.read_timeseries_csv(p)
    np.testing.assert_array_equal(np.asarray(back.mask),
                                  [True, False, False, True])
    np.testing.assert_allclose(np.asarray(back.ts), [0.0, 1.0, 2.0, 3.0])


def test_native_writer_roundtrip(tmp_path):
    data = TimeSeries.from_arrays([0.0, 1.25, 2.5], [1.0, None, -3.75])
    p = str(tmp_path / "w.csv")
    cio.write_timeseries_csv(p, data)
    back = cio.read_timeseries_csv(p)
    np.testing.assert_allclose(np.asarray(back.ts), np.asarray(data.ts))
    np.testing.assert_array_equal(np.asarray(back.mask),
                                  np.asarray(data.mask))
    np.testing.assert_allclose(np.asarray(back.ys), np.asarray(data.ys))


def test_native_json_matches_python(tmp_path):
    data = TimeSeries.from_arrays([0.5, 1.5, 2.5], [1.0, None, 3.0])
    p = str(tmp_path / "d.json")
    cio.write_timeseries_json(p, data)
    back = cio.read_timeseries_json(p)  # native path
    np.testing.assert_allclose(np.asarray(back.ts), np.asarray(data.ts))
    np.testing.assert_array_equal(np.asarray(back.mask),
                                  np.asarray(data.mask))


def test_native_missing_file_returns_none():
    assert native.parse_timeseries_csv("/nonexistent/file.csv") is None


def test_write_matrix_csv_roundtrip(tmp_path):
    from composablestatespacemodels_tpu import native

    if not native.available():
        pytest.skip("native tier unavailable")
    path = str(tmp_path / "m.csv")
    mat = np.arange(12.0).reshape(4, 3) / 7.0
    assert native.write_matrix_csv(path, "a,b,c", mat)
    lines = open(path).read().strip().split("\n")
    assert lines[0] == "a,b,c"
    got = np.array([[float(v) for v in ln.split(",")] for ln in lines[1:]])
    np.testing.assert_array_equal(got, mat)
