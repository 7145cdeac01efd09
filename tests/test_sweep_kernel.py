"""Fused small-N PF sweep kernel (ops/sweep_kernel) -- structural tests.

Interpret-mode Pallas PRNG yields zeros, so these tests pin the
DETERMINISTIC structure bit-exactly: z == 0 propagation, weighting,
ll accumulation, and the in-lane systematic resample (counts, bisection
ancestors, gather) against a step-by-step jnp replica using the same
roll-tree reductions.  Noise statistics and XLA-filter agreement are
gated on chip (tests_tpu/test_sweep_chip.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from composablestatespacemodels_tpu.ops.sweep_kernel import (_LANE,
                                                             pf_sweep_chains)
from composablestatespacemodels_tpu.models.observation import (Gaussian,
                                                               Poisson)


def _roll_reduce(x, op):
    acc = x
    d = 1
    while d < _LANE:
        acc = op(acc, jnp.roll(acc, -d, axis=1))
        d *= 2
    return acc


def _ref_sweep(x0, coef, design, wconsts, mask, weight_fn, n):
    """jnp replica of the kernel recursion with s = 0, ud = 2^-25."""
    b, d, _ = x0.shape
    lane = jnp.arange(_LANE)[None, :]
    valid = lane < n
    x = jnp.concatenate(
        [x0, jnp.zeros((b, d, _LANE - n), x0.dtype)], axis=2)
    ll = jnp.zeros((b,))
    row = jnp.arange(_LANE)[:, None]
    upper = ((row <= jnp.arange(_LANE)[None, :]) & (row < n)).astype(
        jnp.float32)
    ud = jnp.float32(2.0 ** -25)

    class C:
        def __init__(self, tile):
            self.t = tile

        def __getitem__(self, k):
            return self.t[:, k:k + 1]

    for t in range(coef.shape[0]):
        a = coef[t, :, :, 0][:, :, None]
        bb = coef[t, :, :, 1][:, :, None]
        x = a * x + bb  # z == 0 in interpret mode
        mf = jnp.float32(mask[t])
        gamma = jnp.einsum("k,bkl->bl", design[t], x)
        logw = jnp.where(mf > 0, weight_fn(gamma, C(wconsts[t])), 0.0)
        logw = jnp.where(valid, logw, -1e30)
        maxw = _roll_reduce(logw, jnp.maximum)
        u = jnp.where(valid, jnp.exp(logw - maxw), 0.0)
        total = _roll_reduce(u, jnp.add)
        ll = ll + ((maxw + jnp.log(total))[:, 0] - np.log(n)) * mf
        wn = u / total
        cdf = jax.lax.dot(wn, upper, precision=jax.lax.Precision.HIGHEST)
        counts = jnp.clip(jnp.ceil(n * cdf - ud), 0.0, n).astype(jnp.int32)
        counts = jnp.where(lane == n - 1, n, counts)
        m = counts
        dd = 1
        while dd < _LANE:
            m = jnp.maximum(m, jnp.where(lane >= dd,
                                         jnp.roll(m, dd, axis=1), 0))
            dd *= 2
        counts = m
        idx = jnp.zeros((b, _LANE), jnp.int32)
        s = 64
        while s >= 1:
            cand = idx + s
            probe = jnp.minimum(cand - 1, _LANE - 1)
            val = jnp.take_along_axis(counts, probe, axis=1)
            idx = jnp.where((cand <= _LANE) & (val <= lane), cand, idx)
            s //= 2
        anc = jnp.minimum(idx, n - 1)
        x = jnp.take_along_axis(x, anc[:, None, :], axis=2)
    return ll, x[:, :, :n]


@pytest.mark.parametrize("n,d,b", [(100, 1, 8), (64, 3, 16), (128, 7, 8)])
def test_sweep_matches_replica_bitwise(key, n, d, b):
    t_steps = 7
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x0 = jax.random.normal(k1, (b, d, n), jnp.float32)
    # s == 0: interpret-mode PRNG bits are zeros, which Box-Muller maps
    # to a NONZERO constant (r*cos(0) ~ 5.89) -- only the zero-noise
    # structure is replicable off-chip (same convention as the fused
    # resample-kernel tests)
    coef = jnp.stack([
        0.9 + 0.1 * jax.random.uniform(k2, (t_steps, b, d)),
        0.1 * jax.random.normal(k3, (t_steps, b, d)),
        jnp.zeros((t_steps, b, d))], axis=-1)
    design = jax.random.normal(k4, (t_steps, d), jnp.float32)
    fam = Gaussian()
    make_consts, weight_fn = fam.kernel_log_density()
    ys = jnp.linspace(-1.0, 1.0, t_steps)
    scales = 0.5 + jnp.arange(b, dtype=jnp.float32) / b
    wconsts = jax.vmap(lambda y: jax.vmap(
        lambda s: make_consts(y, s))(scales))(ys)
    mask = np.ones((t_steps,), bool)
    mask[3] = False

    with pltpu.force_tpu_interpret_mode():
        ll, xf = pf_sweep_chains(x0, coef, design, wconsts,
                                 jnp.asarray(mask),
                                 jnp.asarray([7], jnp.int32),
                                 weight_family=fam)
    ll_ref, xf_ref = _ref_sweep(np.asarray(x0), np.asarray(coef),
                                np.asarray(design), np.asarray(wconsts),
                                mask, weight_fn, n)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_ref),
                               rtol=1e-6, atol=1e-5)
    # xf agrees to FMA-fusion ulps (the jitted kernel contracts a*x+b
    # differently than the eager replica); an indexing bug would show as
    # O(1) mismatches, not 1e-7
    np.testing.assert_allclose(np.asarray(xf), np.asarray(xf_ref),
                               rtol=2e-5, atol=1e-6)


def test_sweep_masked_steps_contribute_zero(key):
    """All-masked sweep: ll == 0 exactly; the resample under uniform
    weights only ever duplicates within the propagated cloud (cdf ulps
    can flip a count, so exact identity is not guaranteed -- membership
    is)."""
    b, d, n, t_steps = 8, 2, 100, 5
    x0 = jax.random.normal(key, (b, d, n), jnp.float32)
    coef = jnp.broadcast_to(
        jnp.asarray([1.0, 0.5, 0.0], jnp.float32), (t_steps, b, d, 3))
    design = jnp.ones((t_steps, d), jnp.float32)
    fam = Poisson()
    make_consts, _ = fam.kernel_log_density()
    wconsts = jnp.broadcast_to(make_consts(jnp.asarray(0.0), 1.0),
                               (t_steps, b, 2))
    mask = jnp.zeros((t_steps,), bool)
    with pltpu.force_tpu_interpret_mode():
        ll, xf = pf_sweep_chains(x0, coef, design, wconsts, mask,
                                 jnp.asarray([1], jnp.int32),
                                 weight_family=fam)
    np.testing.assert_array_equal(np.asarray(ll), np.zeros((b,)))
    want = np.asarray(x0) + t_steps * 0.5
    got = np.asarray(xf)
    for bi in range(b):
        for di in range(d):
            assert np.isin(np.round(got[bi, di], 4),
                           np.round(want[bi, di], 4)).all(), (bi, di)


def test_make_pf_loglik_chains_end_to_end(key):
    """Front-end: batched-chains loglik on the composed flagship-style
    model runs in interpret mode and returns finite per-chain lls, and
    pmmh_chains(pf_ll_chains=) drives a short batched MH scan."""
    import composablestatespacemodels_tpu as cssm
    from composablestatespacemodels_tpu.models import (branch, leaf,
                                                       ou_params,
                                                       param_node, perturb)

    model = cssm.poisson(cssm.ou_process(1)) + cssm.seasonal(
        6, 1, cssm.ou_process(2))
    params = branch(
        leaf(param_node(None, ou_params(1.0, 0.2, 0.3, 1.0, 0.3))),
        leaf(param_node(None, ou_params(0.2, 0.2, 0.25, 0.2, 0.2))))
    sim = cssm.simulate_regular(model, params, jax.random.PRNGKey(0), 12,
                                dt=1.0)
    data = sim.to_timeseries()
    pf_all = cssm.make_pf_loglik_chains(model, data, 64)
    params_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(jnp.asarray(x)[None],
                                   (8,) + jnp.shape(x)), params)
    with pltpu.force_tpu_interpret_mode():
        ll = pf_all(key, params_b)
    assert ll.shape == (8,)
    assert bool(jnp.isfinite(ll).all())

    with pltpu.force_tpu_interpret_mode():
        res = cssm.pmmh_chains(key, params, None, perturb(0.02), 5, 8,
                               pf_ll_chains=pf_all)
    assert res.lls.shape == (8, 5)
    assert bool(jnp.isfinite(res.lls).all())
    assert res.accepted.shape == (8, 5)


def test_make_pf_loglik_fused_sweep_single_chain(key):
    """make_pf_loglik(fused_sweep=True): scalar ll per call, drivable by
    the single-chain pmmh loop."""
    import composablestatespacemodels_tpu as cssm
    from composablestatespacemodels_tpu.models import (brownian_motion,
                                                       brownian_params,
                                                       parameters, perturb)

    model = cssm.linear(brownian_motion(1))
    p0 = parameters(jnp.log(0.5), brownian_params(0.2, 0.25, 0.3))
    sim = cssm.simulate_regular(model, p0, jax.random.PRNGKey(0), 10, dt=0.5)
    pf_ll = cssm.make_pf_loglik(model, sim.to_timeseries(), 64,
                                fused_sweep=True)
    with pltpu.force_tpu_interpret_mode():
        v = pf_ll(key, p0)
        assert v.shape == ()
        assert bool(jnp.isfinite(v))
        res = cssm.pmmh(key, p0, pf_ll, perturb(0.02), 4)
    assert res.lls.shape == (4,)
    assert bool(jnp.isfinite(res.lls).all())


def test_pilot_run_fused_sweep(key):
    """pilot_run(fused_sweep=True): repetitions run as one iid-chain
    batch through the sweep kernel at counts <= 128, same statistics."""
    import composablestatespacemodels_tpu as cssm
    from composablestatespacemodels_tpu.models import (brownian_motion,
                                                       brownian_params,
                                                       parameters)

    model = cssm.linear(brownian_motion(1))
    p0 = parameters(jnp.log(0.5), brownian_params(0.2, 0.25, 0.3))
    sim = cssm.simulate_regular(model, p0, jax.random.PRNGKey(0), 15, dt=0.5)
    data = sim.to_timeseries()
    with pltpu.force_tpu_interpret_mode():
        out = cssm.pilot_run(model, p0, data, key, particle_counts=(64,),
                             n_reps=12, fused_sweep=True)
    (n, mean, var), = out
    assert n == 64 and np.isfinite(mean) and var >= 0


def test_make_pf_loglik_chains_store_state(key):
    """store_state on the fused-chains tier: per-chain (ll, state) with
    the state one particle of the kernel's returned final cloud, and
    pmmh_chains(pf_ll_chains=, store_state=True) carries joint draws
    (VERDICT r4 #4; reference MetropState, PMMH.scala:26)."""
    import composablestatespacemodels_tpu as cssm
    from composablestatespacemodels_tpu.models import (brownian_motion,
                                                       brownian_params,
                                                       parameters, perturb)
    from composablestatespacemodels_tpu.ops.sweep_kernel import \
        pf_sweep_chains  # noqa: F401  (import sanity)

    model = cssm.linear(brownian_motion(1))
    p0 = parameters(jnp.log(0.5), brownian_params(0.2, 0.25, 0.3))
    sim = cssm.simulate_regular(model, p0, jax.random.PRNGKey(0), 10, dt=0.5)
    data = sim.to_timeseries()
    pf_all = cssm.make_pf_loglik_chains(model, data, 64, store_state=True)
    params_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(jnp.asarray(x)[None],
                                   (8,) + jnp.shape(x)), p0)
    with pltpu.force_tpu_interpret_mode():
        ll, st = pf_all(key, params_b)
    assert ll.shape == (8,) and st.shape == (8, model.dim)
    assert bool(jnp.isfinite(ll).all()) and bool(jnp.isfinite(st).all())

    with pltpu.force_tpu_interpret_mode():
        res = cssm.pmmh_chains(key, p0, None, perturb(0.02), 5, 8,
                               pf_ll_chains=pf_all, store_state=True)
    assert res.states.shape == (8, 5, model.dim)
    assert bool(jnp.isfinite(res.states).all())

    # single-chain front door composes fused_sweep with store_state
    pf_ll = cssm.make_pf_loglik(model, data, 64, fused_sweep=True,
                                store_state=True)
    with pltpu.force_tpu_interpret_mode():
        v, s = pf_ll(key, p0)
        assert v.shape == () and s.shape == (model.dim,)
        res1 = cssm.pmmh(key, p0, pf_ll, perturb(0.02), 4, store_state=True)
    assert res1.states.shape == (4, model.dim)


def _ref_sweep_multi(x0, coef, design, wconsts, mask, weight_fn, n):
    """jnp replica of the MULTI-CHUNK kernel recursion (n > 128) with
    s = 0 and ud = 2^-25, mirroring _make_sweep_kernel_multi op for op
    (two-stage reductions, per-chunk cdf + running offset, carried
    running-max monotoniser, two-phase bisection, chunk-select gathers).
    """
    b, d, _ = x0.shape
    k = -(-n // _LANE)
    K = k * _LANE
    lane = jnp.arange(_LANE)[None, :]
    x = jnp.concatenate([x0, jnp.zeros((b, d, K - n), x0.dtype)], axis=2)
    ll = jnp.zeros((b,))
    row = jnp.arange(_LANE)[:, None]
    upper = (row <= jnp.arange(_LANE)[None, :]).astype(jnp.float32)
    ud = jnp.float32(2.0 ** -25)
    p = 1
    while p < K:
        p *= 2
    hi_rounds = []
    s = p // 2
    while s >= _LANE:
        hi_rounds.append(s)
        s //= 2

    def roll_sum(x):
        # mirrors the kernel's _lane_reduce ADD order exactly: pltpu.roll
        # rolls right (the +dd direction the monotoniser pins down), and
        # f32 sum order matters -- the cross-chunk cdf offsets (run)
        # inherit these ulps, and a ceil boundary flips a count
        acc = x
        dd = 1
        while dd < _LANE:
            acc = acc + jnp.roll(acc, dd, axis=1)
            dd *= 2
        return acc

    class C:
        def __init__(self, tile):
            self.t = tile

        def __getitem__(self, j):
            return self.t[:, j:j + 1]

    for t in range(coef.shape[0]):
        a = coef[t, :, :, 0][:, :, None]
        bb = coef[t, :, :, 1][:, :, None]
        x = a * x + bb  # z == 0 in interpret mode
        mf = jnp.float32(mask[t])
        xs = [x[:, :, c * _LANE:(c + 1) * _LANE] for c in range(k)]
        logws = []
        for c in range(k):
            gamma = jnp.einsum("k,bkl->bl", design[t], xs[c])
            lw = jnp.where(mf > 0, weight_fn(gamma, C(wconsts[t])), 0.0)
            logws.append(jnp.where(lane + c * _LANE < n, lw, -1e30))
        maxw = _roll_reduce(logws[0], jnp.maximum)
        for c in range(1, k):
            maxw = jnp.maximum(maxw, _roll_reduce(logws[c], jnp.maximum))
        us, totals = [], []
        for c in range(k):
            uc = jnp.where(lane + c * _LANE < n,
                           jnp.exp(logws[c] - maxw), 0.0)
            us.append(uc)
            totals.append(roll_sum(uc))
        total = totals[0]
        for c in range(1, k):
            total = total + totals[c]
        ll = ll + ((maxw + jnp.log(total))[:, 0] - np.log(n)) * mf
        counts = []
        run = jnp.zeros((b, _LANE), jnp.float32)
        for c in range(k):
            wn = us[c] / total
            cdf = jax.lax.dot(wn, upper,
                              precision=jax.lax.Precision.HIGHEST) + run
            run = run + totals[c] / total
            cc = jnp.clip(jnp.ceil(n * cdf - ud), 0.0, n).astype(jnp.int32)
            cc = jnp.where(lane + c * _LANE == n - 1, n, cc)
            counts.append(cc)
        carry = jnp.zeros((b, _LANE), jnp.int32)
        maxima = []
        for c in range(k):
            m = counts[c]
            dd = 1
            while dd < _LANE:
                m = jnp.maximum(m, jnp.where(lane >= dd,
                                             jnp.roll(m, dd, axis=1), 0))
                dd *= 2
            m = jnp.maximum(m, carry)
            counts[c] = m
            carry = _roll_reduce(m, jnp.maximum)
            maxima.append(carry)
        new_chunks = []
        for oc in range(k):
            q = lane + oc * _LANE
            idx = jnp.zeros((b, _LANE), jnp.int32)
            for s in hi_rounds:
                cand = idx + s
                pc = (cand >> 7) - 1
                val = maxima[0]
                for c2 in range(1, k):
                    val = jnp.where(pc == c2, maxima[c2], val)
                idx = jnp.where((cand <= K) & (val <= q), cand, idx)
            bc = jnp.minimum(idx >> 7, k - 1)
            for s in (64, 32, 16, 8, 4, 2, 1):
                cand = idx + s
                ploc = (cand - 1) & (_LANE - 1)
                val = jnp.take_along_axis(counts[0], ploc, axis=1)
                for c2 in range(1, k):
                    val = jnp.where(
                        bc == c2,
                        jnp.take_along_axis(counts[c2], ploc, axis=1), val)
                idx = jnp.where((cand <= K) & (val <= q), cand, idx)
            anc = jnp.minimum(idx, n - 1)
            a_ch = jnp.minimum(anc >> 7, k - 1)
            a_loc = anc & (_LANE - 1)
            new = jnp.take_along_axis(xs[0], a_loc[:, None, :], axis=2)
            for c2 in range(1, k):
                new = jnp.where(
                    a_ch[:, None, :] == c2,
                    jnp.take_along_axis(xs[c2], a_loc[:, None, :], axis=2),
                    new)
            new_chunks.append(new)
        x = jnp.concatenate(new_chunks, axis=2)
    return ll, x[:, :, :n]


@pytest.mark.parametrize("n,d,b", [(256, 2, 8), (300, 1, 8), (512, 3, 8),
                                   (1000, 1, 8)])
def test_sweep_multi_chunk_matches_replica(key, n, d, b):
    """Multi-chunk (N > 128) sweep kernel vs its op-for-op jnp replica
    (VERDICT r4 #2: the reference pilot grid goes to N=2000,
    DetermineParameters.scala:22-45; the tier previously vanished above
    128 particles)."""
    t_steps = 6
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x0 = jax.random.normal(k1, (b, d, n), jnp.float32)
    coef = jnp.stack([
        0.9 + 0.1 * jax.random.uniform(k2, (t_steps, b, d)),
        0.1 * jax.random.normal(k3, (t_steps, b, d)),
        jnp.zeros((t_steps, b, d))], axis=-1)
    design = jax.random.normal(k4, (t_steps, d), jnp.float32)
    fam = Gaussian()
    make_consts, weight_fn = fam.kernel_log_density()
    ys = jnp.linspace(-1.0, 1.0, t_steps)
    scales = 0.5 + jnp.arange(b, dtype=jnp.float32) / b
    wconsts = jax.vmap(lambda y: jax.vmap(
        lambda s: make_consts(y, s))(scales))(ys)
    mask = np.ones((t_steps,), bool)
    mask[2] = False

    with pltpu.force_tpu_interpret_mode():
        ll, xf = pf_sweep_chains(x0, coef, design, wconsts,
                                 jnp.asarray(mask),
                                 jnp.asarray([3], jnp.int32),
                                 weight_family=fam)
    # jit the replica: the kernel runs jitted (interpret mode traces into
    # the enclosing jit), and XLA's FMA formation of nf * cdf - ud differs
    # from eager per-op rounding exactly at uniform-weight ceil ties
    # (masked steps), flipping a count
    ll_ref, xf_ref = jax.jit(lambda *a: _ref_sweep_multi(
        *a, mask, weight_fn, n))(x0, coef, design, wconsts)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_ref),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(xf), np.asarray(xf_ref),
                               rtol=2e-5, atol=1e-6)


def test_sweep_multi_chunk_group_loop(key):
    """n > 128 shrinks the per-launch chain cap (64 // chunks): a 64-chain
    N=256 sweep runs as two 32-chain launches whose lls match the
    single-group launches chain for chain."""
    n, d, b, t_steps = 256, 1, 64, 4
    k1, k2 = jax.random.split(key)
    x0 = jax.random.normal(k1, (b, d, n), jnp.float32)
    coef = jnp.broadcast_to(jnp.asarray([0.95, 0.1, 0.0], jnp.float32),
                            (t_steps, b, d, 3))
    design = jnp.ones((t_steps, d), jnp.float32)
    fam = Gaussian()
    make_consts, _ = fam.kernel_log_density()
    wconsts = jnp.broadcast_to(make_consts(jnp.asarray(0.3), 1.0),
                               (t_steps, b, 3))
    mask = jnp.ones((t_steps,), bool)
    with pltpu.force_tpu_interpret_mode():
        ll, xf = pf_sweep_chains(x0, coef, design, wconsts, mask,
                                 jnp.asarray([9], jnp.int32),
                                 weight_family=fam)
        # each 32-chain group re-run solo with the group's derived seed
        seeds = (jnp.asarray([9], jnp.int32)
                 + jnp.arange(2, dtype=jnp.int32) * jnp.int32(0x100003))
        for g in range(2):
            sl = slice(g * 32, (g + 1) * 32)
            ll_g, xf_g = pf_sweep_chains(x0[sl], coef[:, sl], design,
                                         wconsts[:, sl], mask,
                                         seeds[g:g + 1], weight_family=fam)
            np.testing.assert_array_equal(np.asarray(ll[sl]),
                                          np.asarray(ll_g))
            np.testing.assert_array_equal(np.asarray(xf[sl]),
                                          np.asarray(xf_g))


def test_beta_sweep_with_masked_observations_finite(key):
    """Masked observations on the sweep tier with a family whose consts
    are singular at the masked placeholder (Beta: log(y_safe=0) = -inf)
    must contribute exactly zero, not NaN (the kernels select-mask the
    weights; a multiply-mask turned -inf * 0 into NaN and poisoned the
    ll from that step on -- round-5 review finding)."""
    import composablestatespacemodels_tpu as cssm
    from composablestatespacemodels_tpu.models import (brownian_motion,
                                                       brownian_params,
                                                       parameters)

    model = cssm.beta(brownian_motion(1))
    p0 = parameters(jnp.log(2.0), brownian_params(0.1, 0.1, 0.2))
    sim = cssm.simulate_regular(model, p0, jax.random.PRNGKey(0), 10, dt=1.0)
    data = sim.to_timeseries().knock_out(3.0, 6.0)
    assert not bool(data.mask.all())
    pf_all = cssm.make_pf_loglik_chains(model, data, 64)
    params_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(jnp.asarray(x)[None],
                                   (8,) + jnp.shape(x)), p0)
    with pltpu.force_tpu_interpret_mode():
        ll = pf_all(key, params_b)
    assert bool(jnp.isfinite(ll).all()), ll
