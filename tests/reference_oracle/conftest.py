"""Fixtures for allclose-vs-DiffeRT oracle tests.

These tests import the reference (``/root/reference``) read-only via
:mod:`tests.reference_oracle.loader` and assert that this repo's
implementations agree numerically — the correctness bar demanded by
BASELINE.json ("allclose vs DiffeRT on traced path geometry, coverage
power maps, and gradients").
"""

import pytest

from .loader import load_reference, reference_available


@pytest.fixture(scope="session")
def ref():
    if not reference_available():
        pytest.skip("DiffeRT reference sources not available")
    return load_reference()
