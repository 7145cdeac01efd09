"""On-chip verification suite: runs ONLY on a real TPU backend.

``tests/`` is the CI suite (CPU, 8 virtual devices, Pallas interpret
mode).  This directory is the complement: it compiles the Pallas kernels
through the REAL Mosaic compiler and bit-compares them against their XLA
references.  Interpret mode has repeatedly passed code the chip rejects
or silently corrupts (CLAUDE.md: the [1, 1]-slice broadcast that broke
``systematic_counts_fused`` for 5 commits; the [B, 1, 128] vmap tiling
garbage), so every kernel change must go through this gate:

    python -m pytest tests_tpu/ -q      # on a machine with the TPU

Budget ~10-20 min: each distinct kernel shape costs a 40-150 s remote
compile through the tunnel (not cached across processes).
"""

import jax
import pytest


def pytest_collection_modifyitems(config, items):
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if on_tpu:
        return
    skip = pytest.mark.skip(reason="tests_tpu/ requires a real TPU backend")
    for item in items:
        item.add_marker(skip)


@pytest.fixture
def key():
    return jax.random.PRNGKey(42)
