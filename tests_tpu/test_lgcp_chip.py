"""On-chip LGCP drives: the flat fine-grid scan and its mesh= tier.

The CI suite covers these paths on the virtual 8-device CPU mesh
(tests/test_lgcp.py); this file compiles them through the real backend —
the sharded path's scalar collectives + distributed resampler on a
1-device TPU mesh must agree with the single-device filter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import composablestatespacemodels_tpu as cssm
from composablestatespacemodels_tpu.inference.lgcp import lgcp_filter
from composablestatespacemodels_tpu.models import (brownian_motion,
                                                   brownian_params,
                                                   parameters)
from composablestatespacemodels_tpu.utils.data import TimeSeries


@pytest.fixture(scope="module")
def lgcp_case():
    model = cssm.lgcp(brownian_motion(1))
    params = parameters(None, brownian_params(1.0, 0.05, 0.05))
    ts = jnp.asarray([0.0, 0.3, 0.35, 1.9, 2.0, 3.1])
    data = TimeSeries(ts, jnp.ones_like(ts), jnp.ones(ts.shape, bool))
    return model, params, data


def test_lgcp_mesh_matches_single_device_on_chip(lgcp_case):
    from composablestatespacemodels_tpu.parallel import particle_mesh

    model, params, data = lgcp_case
    key = jax.random.PRNGKey(7)
    r1 = lgcp_filter(model, params, data, 512, key, precision=1)
    r2 = lgcp_filter(model, params, data, 512, key, precision=1,
                     mesh=particle_mesh())
    assert np.isfinite(float(r2.ll))
    # different propagation key folding => MC-level agreement only
    assert abs(float(r1.ll) - float(r2.ll)) < 1.5, (r1.ll, r2.ll)
    ess = np.asarray(r2.ess)
    assert (ess >= 1).all() and (ess <= 512).all()
    assert bool((np.asarray(r2.eta_lower) <= np.asarray(r2.eta_upper)).all())


def test_lgcp_pallas_resample_bit_match_on_chip(lgcp_case):
    """'systematic-pallas' through the REAL Mosaic compiler (interpret mode
    has passed kernels the chip rejects) against the XLA scheme."""
    model, params, data = lgcp_case
    key = jax.random.PRNGKey(3)
    rp = lgcp_filter(model, params, data, 1024, key, precision=1,
                     resample="systematic-pallas")
    rs = lgcp_filter(model, params, data, 1024, key, precision=1)
    np.testing.assert_allclose(np.asarray(rp.ll), np.asarray(rs.ll),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(rp.final_particles),
                                  np.asarray(rs.final_particles))
