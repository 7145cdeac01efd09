"""Real-Mosaic kernel verification: bit-compare every Pallas kernel against
its XLA reference ON CHIP.

The CI suite runs these kernels in interpret mode only; this file is the
hardware gate (see conftest docstring).  Weight regimes deliberately cover
the duplication extremes: uniform (narrow hi spans, windowed fast path) to
degenerate (one particle owns every slot, full-select fallback + manual
DMA extras).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composablestatespacemodels_tpu.inference.resampling import (
    _ancestors_from_counts, systematic_counts)
from composablestatespacemodels_tpu.ops.scan_kernel import (
    cummax_int32, prefix_sum, systematic_counts_fused)
from composablestatespacemodels_tpu.ops.resample_kernel import (
    sorted_gather_resample_propagate_t, sorted_gather_resample_t)


def _regimes(n):
    i = jnp.arange(n)
    return {
        "uniform": jnp.zeros((n,)),
        "mild": jax.random.normal(jax.random.PRNGKey(1), (n,)),
        "heavy": 5.0 * jax.random.normal(jax.random.PRNGKey(2), (n,)),
        "degenerate": jnp.where(i == n // 3, 100.0, 0.0),
        "two-spikes": jnp.where((i == 7) | (i == n - 3), 50.0, 0.0),
    }


def _xla_counts(key, w, n):
    """The op-by-op composition systematic_counts_fused must bit-match."""
    from composablestatespacemodels_tpu.inference.resampling import (
        _cumsum, _monotone_counts, _normalise)
    u = jax.random.uniform(key, (), w.dtype)
    cdf = _cumsum(_normalise(w))
    counts = jnp.clip(jnp.ceil(n * cdf - u), 0, n).astype(jnp.int32)
    counts = counts.at[-1].set(n)
    return _monotone_counts(counts)


def test_fused_counts_bit_match_xla(key):
    n = 1 << 14
    for name, logw in _regimes(n).items():
        w = jax.nn.softmax(logw)
        k = jax.random.fold_in(key, hash(name) % 1000)
        fused = systematic_counts(k, w)      # TPU path -> fused kernel
        ref = _xla_counts(k, w, n)
        np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref),
                                      err_msg=name)


def test_fused_counts_vmap_rows_match_solo(key):
    b, n = 8, 1 << 12
    w = jax.random.uniform(key, (b, n), jnp.float32) + 1e-3
    tot = jnp.sum(w, axis=1)
    u = jax.random.uniform(jax.random.fold_in(key, 1), (b,), jnp.float32)
    batched = jax.jit(jax.vmap(
        lambda wi, ti, ui: systematic_counts_fused(wi, ti, ui)))(w, tot, u)
    for i in range(b):
        solo = systematic_counts_fused(w[i], tot[i], u[i])
        np.testing.assert_array_equal(np.asarray(batched[i]),
                                      np.asarray(solo), err_msg=f"row {i}")


def test_prefix_and_cummax_vmap_rows_match_solo(key):
    b, n = 8, 1 << 12
    x = jax.random.normal(key, (b, n), jnp.float32)
    ci = (jnp.abs(x) * 7).astype(jnp.int32)
    pb = jax.jit(jax.vmap(prefix_sum))(x)
    cb = jax.jit(jax.vmap(cummax_int32))(ci)
    for i in range(b):
        np.testing.assert_array_equal(np.asarray(pb[i]),
                                      np.asarray(prefix_sum(x[i])))
        np.testing.assert_array_equal(np.asarray(cb[i]),
                                      np.asarray(cummax_int32(ci[i])))


@pytest.mark.parametrize("block,dup_window", [(2048, 0), (2048, 3),
                                              (1024, 3)])
def test_merge_kernel_bit_match_xla(key, block, dup_window):
    n, d = 1 << 15, 8
    x_t = jax.random.normal(jax.random.PRNGKey(3), (d, n), jnp.float32)
    for name, logw in _regimes(n).items():
        w = jax.nn.softmax(logw)
        counts = systematic_counts(jax.random.fold_in(key, hash(name) % 97),
                                   w)
        y = sorted_gather_resample_t(x_t, counts, block=block,
                                     dup_window=dup_window)
        ref = x_t[:, _ancestors_from_counts(counts, n)]
        np.testing.assert_array_equal(np.asarray(y), np.asarray(ref),
                                      err_msg=f"{name} block={block} "
                                              f"W={dup_window}")


def test_fused_propagate_affine_exact(key):
    """s=0 makes the fused kernel deterministic: out = a*resampled + b."""
    n, d = 1 << 14, 8
    x_t = jax.random.normal(jax.random.PRNGKey(4), (d, n), jnp.float32)
    w = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(5), (n,)))
    counts = systematic_counts(key, w)
    a = jnp.linspace(0.5, 1.5, d)
    b = jnp.linspace(-1.0, 1.0, d)
    coef = jnp.stack([a, b, jnp.zeros(d)], axis=1)
    for dw in (0, 3):
        y = sorted_gather_resample_propagate_t(
            x_t, counts, coef, jnp.int32([7]), block=2048, dup_window=dw)
        ref = (a[:, None] * x_t[:, _ancestors_from_counts(counts, n)]
               + b[:, None])
        np.testing.assert_array_equal(np.asarray(y), np.asarray(ref),
                                      err_msg=f"W={dw}")


def test_fused_propagate_noise_moments(key):
    """In-kernel Box-Muller: a=0, b=0, s=1 leaves pure noise; check
    moments loosely (mean ~0, var ~1, kurtosis ~3) at N=2^17 x d=8."""
    n, d = 1 << 17, 8
    x_t = jnp.zeros((d, n), jnp.float32)
    w = jnp.full((n,), 1.0 / n)
    counts = systematic_counts(key, w)
    coef = jnp.stack([jnp.zeros(d), jnp.zeros(d), jnp.ones(d)], axis=1)
    z = np.asarray(sorted_gather_resample_propagate_t(
        x_t, counts, coef, jnp.int32([12345]), block=2048)).ravel()
    assert abs(z.mean()) < 5e-3, z.mean()
    assert abs(z.std() - 1.0) < 5e-3, z.std()
    kurt = ((z - z.mean()) ** 4).mean() / z.var() ** 2
    assert abs(kurt - 3.0) < 0.05, kurt


def test_standalone_propagate_affine_and_weights(key):
    """propagate_weights_t on chip: s=0 is the exact affine transition and
    the fused weight row matches the XLA log-density of the propagated
    block (Poisson hook, the flagship family)."""
    from composablestatespacemodels_tpu.models.observation import Poisson
    from composablestatespacemodels_tpu.ops.resample_kernel import (
        propagate_weights_t)

    n, d = 1 << 14, 8
    x_t = 0.3 * jax.random.normal(jax.random.PRNGKey(6), (d, n), jnp.float32)
    a = jnp.concatenate([jnp.linspace(0.5, 1.2, d - 1), jnp.zeros((1,))])
    b = jnp.concatenate([jnp.linspace(-0.5, 0.5, d - 1), jnp.zeros((1,))])
    fc = jnp.concatenate([jnp.linspace(0.5, 1.5, d - 1), jnp.zeros((1,))])
    coef = jnp.stack([a, b, jnp.zeros(d)], axis=1)
    y = propagate_weights_t(x_t, coef, jnp.int32([7]), block=2048)
    ref = a[:, None] * x_t + b[:, None]
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))

    fam = Poisson()
    make_consts, _ = fam.kernel_log_density()
    consts = make_consts(jnp.asarray(3.0), jnp.asarray(1.0))
    coefw = jnp.stack([a, b, jnp.zeros(d), fc], axis=1)
    yw = propagate_weights_t(x_t, coefw, jnp.int32([7]), block=2048,
                             weight_family=fam, weight_consts=consts,
                             weight_row=d - 1)
    gamma = jnp.sum(fc[:, None] * ref, axis=0)
    want = fam.log_density(gamma, jnp.asarray(3.0), jnp.asarray(1.0))
    np.testing.assert_allclose(np.asarray(yw[d - 1]), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(yw[: d - 1]),
                                  np.asarray(ref[: d - 1]))


def test_standalone_propagate_noise_moments(key):
    """In-kernel Box-Muller of the standalone kernel: a=0, b=0, s=1 leaves
    pure noise; moments at N=2^17 x d=8, plus seed decorrelation."""
    from composablestatespacemodels_tpu.ops.resample_kernel import (
        propagate_weights_t)

    n, d = 1 << 17, 8
    x_t = jnp.zeros((d, n), jnp.float32)
    coef = jnp.stack([jnp.zeros(d), jnp.zeros(d), jnp.ones(d)], axis=1)
    z = np.asarray(propagate_weights_t(
        x_t, coef, jnp.int32([321]), block=2048)).ravel()
    assert abs(z.mean()) < 5e-3, z.mean()
    assert abs(z.std() - 1.0) < 5e-3, z.std()
    kurt = ((z - z.mean()) ** 4).mean() / z.var() ** 2
    assert abs(kurt - 3.0) < 0.05, kurt
    z2 = np.asarray(propagate_weights_t(
        x_t, coef, jnp.int32([322]), block=2048)).ravel()
    assert abs(np.corrcoef(z, z2)[0, 1]) < 5e-3


def test_fused_counts_vmap_packed_pmmh_shape(key):
    """The packed batched counts kernel at the reference PMMH shape
    (m=100 -> 8-row chains, 32 chains/superblock, odd batch exercising
    dummy-chain padding) must bit-match per-chain solo calls ON CHIP --
    the path pmmh_chains rides (2x throughput win, round 4)."""
    b, m = 37, 100
    w = jax.random.uniform(key, (b, m), jnp.float32) + 1e-3
    tot = jnp.sum(w, axis=1)
    u = jax.random.uniform(jax.random.fold_in(key, 1), (b,), jnp.float32)
    batched = jax.jit(jax.vmap(
        lambda wi, ti, ui: systematic_counts_fused(wi, ti, ui)))(w, tot, u)
    assert batched.shape == (b, m)
    for i in range(0, b, 5):
        solo = systematic_counts_fused(w[i], tot[i], u[i])
        np.testing.assert_array_equal(np.asarray(batched[i]),
                                      np.asarray(solo), err_msg=f"row {i}")


def test_beta_weight_hook_on_chip(key):
    """Beta's in-kernel Stirling-lgamma weight hook (VERDICT r4 #6) on the
    REAL Mosaic compiler: propagate_weights_t's fused weight row matches
    the XLA log_density of the propagated block within f32 tolerance, and
    a Beta fused bootstrap filter agrees with the plain path's ll within
    MC error (Model.scala:339-353)."""
    import composablestatespacemodels_tpu as cssm
    from composablestatespacemodels_tpu.models import (brownian_motion,
                                                       brownian_params,
                                                       parameters)
    from composablestatespacemodels_tpu.models.observation import Beta
    from composablestatespacemodels_tpu.ops.resample_kernel import (
        propagate_weights_t)

    n, d = 1 << 13, 2
    x_t = 0.4 * jax.random.normal(jax.random.PRNGKey(8), (d, n), jnp.float32)
    a = jnp.asarray([0.9, 0.0])
    b = jnp.asarray([0.05, 0.0])
    fc = jnp.asarray([1.0, 0.0])
    fam = Beta()
    make_consts, _ = fam.kernel_log_density()
    consts = make_consts(jnp.asarray(0.37), jnp.asarray(2.0))
    coefw = jnp.stack([a, b, jnp.zeros(d), fc], axis=1)
    yw = propagate_weights_t(x_t, coefw, jnp.int32([11]), block=2048,
                             weight_family=fam, weight_consts=consts,
                             weight_row=d - 1)
    ref = a[:, None] * x_t + b[:, None]
    gamma = jnp.sum(fc[:, None] * ref, axis=0)
    want = fam.log_density(gamma, jnp.asarray(0.37), jnp.asarray(2.0))
    # Mosaic's log/exp are ~1e-5-relative; the Stirling (z-0.5)*ln z term
    # (z up to ~14 here) magnifies that to ~1e-3 absolute on the
    # log-weight (CPU pins the approximation itself at 1e-4,
    # tests/test_observation.py) -- far below PF MC noise, as the ll
    # agreement below confirms
    np.testing.assert_allclose(np.asarray(yw[d - 1]), np.asarray(want),
                               rtol=2e-3, atol=2e-3)

    model = cssm.beta(brownian_motion(1))
    params = parameters(jnp.log(2.0), brownian_params(0.1, 0.1, 0.2))
    sim = cssm.simulate_regular(model, params, jax.random.PRNGKey(0), 60,
                                dt=1.0)
    data = sim.to_timeseries()
    lls_f = np.asarray([float(cssm.log_likelihood(
        model, params, data, 4096, jax.random.fold_in(key, i),
        resample="systematic-pallas-fused")) for i in range(4)])
    lls_p = np.asarray([float(cssm.log_likelihood(
        model, params, data, 4096, jax.random.fold_in(key, 10 + i)))
        for i in range(4)])
    joint_sd = np.sqrt(lls_f.var() / 4 + lls_p.var() / 4)
    assert abs(lls_f.mean() - lls_p.mean()) < max(4 * joint_sd, 0.5), (
        lls_f.mean(), lls_p.mean(), joint_sd)


def test_counts_cols_kernel_bit_match_on_chip(key):
    """The cols-emitting counts kernel (VERDICT r4 #3 fold) on the REAL
    Mosaic compiler: bit-identical to the flat fused counts + XLA layout
    across weight regimes and block sizes (in-kernel transpose/concat are
    exercised here on real tiling)."""
    from composablestatespacemodels_tpu.ops.scan_kernel import (
        _cols_layout_xla, systematic_counts_cols, systematic_counts_fused)

    m = 1 << 20
    regimes = {
        "uniform": jnp.ones((m,)),
        "mild": jnp.exp(0.5 * jax.random.normal(key, (m,))),
        "heavy": jax.random.exponential(jax.random.fold_in(key, 1),
                                        (m,)) ** 4,
        "degenerate": jnp.zeros((m,)).at[m // 3].set(1.0),
    }
    for block in (4096, 2048):
        for name, w in regimes.items():
            u = jax.random.uniform(jax.random.fold_in(key, 7), ())
            total = jnp.sum(w)
            cols, mx = systematic_counts_cols(w, total, u, block=block)
            flat = systematic_counts_fused(w, total, u)
            cols_ref, mx_ref = _cols_layout_xla(flat, m, block)
            np.testing.assert_array_equal(
                np.asarray(cols), np.asarray(cols_ref),
                err_msg=f"cols {name} block={block}")
            np.testing.assert_array_equal(
                np.asarray(mx), np.asarray(mx_ref),
                err_msg=f"mx {name} block={block}")
