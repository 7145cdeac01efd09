"""IO round-trips (reference JsonTest.scala:16-64) + checkpoint/resume +
streaming utilities."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composablestatespacemodels_tpu import (TimeSeries, linear,
                                            simulate_regular)
from composablestatespacemodels_tpu.inference import pmmh as pm
from composablestatespacemodels_tpu.models import (branch, brownian_params,
                                                   flatten_params,
                                                   gen_brownian_params, leaf,
                                                   ou_params, param_node,
                                                   parameters, perturb)
from composablestatespacemodels_tpu.utils import checkpoint as ckpt
from composablestatespacemodels_tpu.utils import io as cio
from composablestatespacemodels_tpu.utils import streaming as strm
from composablestatespacemodels_tpu.models import brownian_motion


def make_tree():
    return branch(
        leaf(param_node(jnp.log(2.0), ou_params(0.1, 1.0, 0.3, 0.5, 0.4))),
        leaf(param_node(None, brownian_params([0.0, 1.0], [1.0, 2.0], 0.5))))


def test_timeseries_csv_roundtrip(tmp_path):
    data = TimeSeries.from_arrays([0.0, 1.0, 2.5], [1.0, None, 3.0])
    p = str(tmp_path / "d.csv")
    cio.write_timeseries_csv(p, data)
    back = cio.read_timeseries_csv(p)
    np.testing.assert_allclose(back.ts, data.ts)
    np.testing.assert_array_equal(back.mask, data.mask)
    np.testing.assert_allclose(back.ys, data.ys)


def test_timeseries_csv_na_parsing(tmp_path):
    p = str(tmp_path / "na.csv")
    with open(p, "w") as f:
        f.write("0.0,1.5\n1.0,NA\n2.0,\n3.0,4.0\n")
    back = cio.read_timeseries_csv(p)
    np.testing.assert_array_equal(back.mask, [True, False, False, True])


def test_timeseries_json_roundtrip(tmp_path):
    data = TimeSeries.from_arrays([0.0, 1.0], [2.0, None])
    p = str(tmp_path / "d.json")
    cio.write_timeseries_json(p, data)
    back = cio.read_timeseries_json(p)
    np.testing.assert_allclose(back.ts, data.ts)
    np.testing.assert_array_equal(back.mask, data.mask)


def test_params_json_roundtrip(tmp_path):
    tree = make_tree()
    p = str(tmp_path / "p.json")
    cio.write_params_json(p, tree)
    back = cio.read_params_json(p)
    np.testing.assert_allclose(flatten_params(back), flatten_params(tree),
                               rtol=1e-6)
    assert (jax.tree_util.tree_structure(back)
            == jax.tree_util.tree_structure(tree))


def test_params_json_all_families(tmp_path):
    for sde_p in [brownian_params(0, 1, 1),
                  gen_brownian_params(0, 1, 0.5, 1),
                  ou_params(0, 1, 0.3, 0, 1)]:
        tree = parameters(0.5, sde_p)
        p = str(tmp_path / "p.json")
        cio.write_params_json(p, tree)
        back = cio.read_params_json(p)
        np.testing.assert_allclose(flatten_params(back),
                                   flatten_params(tree), rtol=1e-6)


@pytest.fixture(scope="module")
def chain(tmp_path_factory):
    model = linear(brownian_motion(1))
    p0 = parameters(jnp.log(0.5), brownian_params(0.2, 0.25, 0.3))
    sim = simulate_regular(model, p0, jax.random.PRNGKey(0), 40, dt=0.5)
    pf_ll = pm.make_pf_loglik(model, sim.to_timeseries(), 64)
    res = pm.pmmh(jax.random.PRNGKey(1), p0, pf_ll, perturb(0.01), 50)
    return p0, pf_ll, res


def test_posterior_json_roundtrip(tmp_path, chain):
    p0, pf_ll, res = chain
    path = str(tmp_path / "post.json")
    cio.write_posterior_json(path, res)
    stacked, lls, accs = cio.read_posterior_json(path, burn_in=10, thin=2)
    assert lls.shape == (20,)
    np.testing.assert_allclose(lls, res.lls[10::2], rtol=1e-6)
    np.testing.assert_allclose(stacked.value.scale,
                               res.params.value.scale[10::2], rtol=1e-6)


def test_posterior_to_csv(tmp_path, chain):
    p0, pf_ll, res = chain
    jpath = str(tmp_path / "post.json")
    cpath = str(tmp_path / "post.csv")
    cio.write_posterior_json(jpath, res)
    cio.posterior_to_csv(jpath, cpath, p0)
    lines = open(cpath).read().strip().split("\n")
    header = lines[0].split(",")
    assert header[0] == "scale" and header[-1] == "ll"
    assert len(lines) == 51


def test_checkpoint_roundtrip(tmp_path):
    tree = make_tree()
    state = {"params": tree, "ll": jnp.asarray(-12.5),
             "accepted": jnp.asarray(7, jnp.int32),
             "key": jax.random.key_data(jax.random.PRNGKey(3))}
    path = str(tmp_path / "chain.npz")
    ckpt.save_checkpoint(path, state)
    back = ckpt.restore_checkpoint(path, state)
    np.testing.assert_allclose(flatten_params(back["params"]),
                               flatten_params(tree))
    assert float(back["ll"]) == -12.5
    assert int(back["accepted"]) == 7
    k1 = jax.random.wrap_key_data(back["key"])
    np.testing.assert_array_equal(jax.random.key_data(k1),
                                  jax.random.key_data(jax.random.PRNGKey(3)))


def test_checkpoint_shape_mismatch_raises(tmp_path):
    path = str(tmp_path / "c.npz")
    ckpt.save_checkpoint(path, {"x": jnp.ones((3,))})
    with pytest.raises(ValueError):
        ckpt.restore_checkpoint(path, {"x": jnp.ones((4,))})


def test_online_filter_matches_batch(key):
    from composablestatespacemodels_tpu import log_likelihood

    model = linear(brownian_motion(1))
    params = parameters(jnp.log(0.5), brownian_params(0.2, 0.25, 0.3))
    sim = simulate_regular(model, params, key, 60, dt=0.5)
    data = sim.to_timeseries()

    of = strm.OnlineFilter(model, params, 3000, key, t0=float(data.ts[0]))
    for lo in range(0, 60, 20):
        of.step(TimeSeries(data.ts[lo:lo + 20], data.ys[lo:lo + 20],
                           data.mask[lo:lo + 20]))
    assert of.n_observed == 60
    batch_lls = [float(log_likelihood(model, params, data, 3000,
                                      jax.random.fold_in(key, i)))
                 for i in range(4)]
    assert abs(float(of.ll) - np.mean(batch_lls)) < 3.0


def test_pmmh_monitored_checkpoint_resume(tmp_path, capsys, key):
    model = linear(brownian_motion(1))
    p0 = parameters(jnp.log(0.5), brownian_params(0.2, 0.25, 0.3))
    sim = simulate_regular(model, p0, key, 30, dt=0.5)
    pf_ll = pm.make_pf_loglik(model, sim.to_timeseries(), 64)
    path = str(tmp_path / "chain.npz")

    res1 = strm.pmmh_monitored(key, p0, pf_ll, perturb(0.01), 60,
                               chunk_size=20, checkpoint_path=path,
                               log_every=False)
    assert res1.lls.shape == (60,)

    # a fresh call resumes from the checkpoint: completed chunks are
    # reloaded from disk, so the FULL chain comes back (not just the
    # post-resume tail) and the acceptance rate is consistent
    res2 = strm.pmmh_monitored(key, p0, pf_ll, perturb(0.01), 80,
                               chunk_size=20, checkpoint_path=path,
                               log_every=False)
    assert res2.lls.shape == (80,)
    np.testing.assert_allclose(res2.lls[:60], res1.lls, rtol=1e-6)
    np.testing.assert_array_equal(res2.accepted[:60], res1.accepted)
    # cumulative accepted count must be nondecreasing across the resume seam
    assert np.all(np.diff(np.asarray(res2.accepted)) >= 0)
    assert 0.0 <= float(res2.acceptance_rate()) <= 1.0


def test_pmmh_monitored_store_state_resume(tmp_path, key):
    """Joint-posterior chains (store_state) checkpoint and resume: the
    carried latent state survives the seam and the full states array comes
    back (monitorStateStream parity, Streaming.scala:84-94)."""
    model = linear(brownian_motion(1))
    p0 = parameters(jnp.log(0.5), brownian_params(0.2, 0.25, 0.3))
    sim = simulate_regular(model, p0, key, 30, dt=0.5)
    pf_ll = pm.make_pf_loglik(model, sim.to_timeseries(), 64,
                              store_state=True)
    path = str(tmp_path / "jchain.npz")

    res1 = strm.pmmh_monitored(key, p0, pf_ll, perturb(0.01), 40,
                               chunk_size=20, store_state=True,
                               checkpoint_path=path, log_every=False)
    assert res1.states.shape == (40, model.dim)
    res2 = strm.pmmh_monitored(key, p0, pf_ll, perturb(0.01), 60,
                               chunk_size=20, store_state=True,
                               checkpoint_path=path, log_every=False)
    assert res2.states.shape == (60, model.dim)
    np.testing.assert_allclose(np.asarray(res2.states[:40]),
                               np.asarray(res1.states), rtol=1e-6)
    # states refresh exactly on acceptances across the seam too
    inc = np.diff(np.asarray(res2.accepted))
    same = (np.asarray(res2.states[1:])
            == np.asarray(res2.states[:-1])).all(1)
    np.testing.assert_array_equal(same, inc == 0)


def test_checkpoint_dtype_mismatch_raises(tmp_path):
    path = str(tmp_path / "c.npz")
    ckpt.save_checkpoint(path, {"x": jnp.ones((3,), jnp.float32)})
    with pytest.raises(ValueError, match="dtype"):
        ckpt.restore_checkpoint(path, {"x": jnp.ones((3,), jnp.int32)})


def test_thin_stream():
    xs = {"a": jnp.arange(10), "b": jnp.arange(20).reshape(10, 2)}
    out = strm.thin_stream(xs, 2)
    assert out["a"].shape == (5,)
    assert out["b"].shape == (5, 2)


def test_ascii_histogram(capsys, key):
    strm.ascii_histogram(jax.random.normal(key, (1000,)), bins=5)
    outp = capsys.readouterr().out
    assert outp.count("|") == 5


def test_timestamp_roundtrip():
    from composablestatespacemodels_tpu.utils.data import (
        timeseries_from_timestamps, timestamps_of)

    stamps = np.asarray(["2024-01-01T00:00", "2024-01-01T06:00",
                         "2024-01-02T00:00"], dtype="datetime64[ns]")
    data, epoch = timeseries_from_timestamps(stamps, [1.0, None, 3.0],
                                             unit="h")
    np.testing.assert_allclose(data.ts, [0.0, 6.0, 24.0])
    np.testing.assert_array_equal(data.mask, [True, False, True])
    back = timestamps_of(data.ts, epoch, unit="h")
    assert (back == stamps).all()


def test_timestamped_json_roundtrip(tmp_path):
    """ISO-timestamped observation records round-trip exactly (the
    reference's TimestampObservation codec, jsonFormats.scala:106-118)."""
    from composablestatespacemodels_tpu.utils.data import (
        timeseries_from_timestamps, timestamps_of)
    from composablestatespacemodels_tpu.utils.io import (
        read_timestamped_json, write_timestamped_json)

    stamps = np.asarray(["2024-01-01T00:00", "2024-01-01T06:30",
                         "2024-01-02T00:00", "2024-01-03T12:00"],
                        dtype="datetime64[ns]")
    data, epoch = timeseries_from_timestamps(
        stamps, [1.0, None, 3.5, -2.0], unit="h")
    path = str(tmp_path / "stamped.json")
    write_timestamped_json(path, data, epoch, unit="h")
    back, epoch2 = read_timestamped_json(path, unit="h", epoch=epoch)
    np.testing.assert_allclose(np.asarray(back.ts), np.asarray(data.ts))
    np.testing.assert_array_equal(np.asarray(back.mask),
                                  np.asarray(data.mask))
    np.testing.assert_allclose(np.asarray(back.ys), np.asarray(data.ys))
    assert epoch2 == epoch
    # the written stamps are the exact wall-clock instants
    assert (timestamps_of(back.ts, epoch2, unit="h") == stamps).all()
    # default epoch (first record) also reconstructs a consistent axis
    back3, epoch3 = read_timestamped_json(path, unit="h")
    assert epoch3 == stamps[0]
    np.testing.assert_allclose(np.asarray(back3.ts), np.asarray(data.ts))


def test_time_fn_and_benchmark_filter(key):
    import jax.numpy as jnp

    from composablestatespacemodels_tpu import linear, simulate_regular
    from composablestatespacemodels_tpu.models import (brownian_motion,
                                                       brownian_params,
                                                       parameters)
    from composablestatespacemodels_tpu.utils import profiling

    med, times = profiling.time_fn(lambda x: x * 2, jnp.ones((8,)),
                                   repeats=3, warmup=1)
    assert med >= 0 and len(times) == 3

    model = linear(brownian_motion(1))
    params = parameters(jnp.log(0.5), brownian_params(0.0, 1.0, 0.4))
    sim = simulate_regular(model, params, key, 10)
    out = profiling.benchmark_filter(model, params, sim.to_timeseries(), key,
                                     particle_counts=(64, 128), repeats=1)
    assert len(out) == 2
    assert out[0][2] > 0


# ---------------------------------------------------------------------------
# state-record codecs (jsonFormats.scala:120-143) + stream trivia
# ---------------------------------------------------------------------------


def test_pf_state_json_roundtrip(tmp_path, key):
    parts = jax.random.normal(key, (16, 3))
    recs = [(0.5, 1.2, parts, -3.4, 12),
            (1.0, None, parts + 1.0, -7.8, 9)]   # missing observation
    path = str(tmp_path / "pf.json")
    cio.write_pf_states_json(path, recs)
    back = cio.read_pf_states_json(path)
    assert len(back) == 2
    t, obs, p, ll, ess = back[0]
    assert (t, obs, ll, ess) == (0.5, 1.2, -3.4, 12)
    np.testing.assert_allclose(p, parts, rtol=1e-6)
    assert back[1][1] is None


def test_state_space_and_metrop_state_roundtrip(key):
    t, s = cio.state_space_from_json(
        cio.state_space_to_json(2.5, jnp.asarray([1.0, -2.0])))
    assert t == 2.5
    np.testing.assert_allclose(s, [1.0, -2.0])

    p0 = make_tree()
    d = cio.metrop_state_to_json(-11.0, p0, 3.0, jnp.asarray([0.1]), 42)
    ll, p1, st, sv, acc = cio.metrop_state_from_json(
        json.loads(json.dumps(d)))
    assert (ll, st, acc) == (-11.0, 3.0, 42)
    np.testing.assert_allclose(flatten_params(p1), flatten_params(p0),
                               rtol=1e-6)


def test_min_sink():
    # faithful to the reference's 0.0 seed (Streaming.scala:197-198)
    assert strm.min_sink([3.0, -2.0, 5.0]) == -2.0
    assert strm.min_sink([3.0, 2.0]) == 0.0


def test_monitor_stream(capsys):
    recs = [(0.0, i + 1) for i in range(250)]
    out_recs = list(strm.monitor_stream(iter(recs), every=100))
    assert out_recs == recs
    err = capsys.readouterr().err
    assert "Iteration: 100" in err and "Iteration: 200" in err
    assert "Iteration: 250" not in err


def test_windowed_mean_params():
    stacked = {"a": jnp.arange(10.0), "b": jnp.ones((10, 2))}
    out = strm.windowed_mean_params(stacked, 4)
    np.testing.assert_allclose(out["a"], [1.5, 5.5])
    assert out["b"].shape == (2, 2)


def test_online_filter_on_mesh(key):
    """OnlineFilter carries a sharded cloud across chunks (mesh= support)."""
    from composablestatespacemodels_tpu import log_likelihood
    from composablestatespacemodels_tpu.parallel import particle_mesh

    model = linear(brownian_motion(1))
    params = parameters(jnp.log(0.5), brownian_params(0.2, 0.25, 0.3))
    sim = simulate_regular(model, params, key, 40, dt=0.5)
    data = sim.to_timeseries()

    of = strm.OnlineFilter(model, params, 1024, key, t0=float(data.ts[0]),
                           mesh=particle_mesh())
    for lo in range(0, 40, 20):
        of.step(TimeSeries(data.ts[lo:lo + 20], data.ys[lo:lo + 20],
                           data.mask[lo:lo + 20]))
    assert of.n_observed == 40
    batch = float(log_likelihood(model, params, data, 1024, key))
    assert abs(float(of.ll) - batch) < 3.0
