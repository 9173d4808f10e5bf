"""Fixtures for allclose-vs-DiffeRT oracle tests.

These tests import the reference (``/root/reference``) read-only via
:mod:`tests.reference_oracle.loader` and assert that this repo's
implementations agree numerically — the correctness bar demanded by
BASELINE.json ("allclose vs DiffeRT on traced path geometry, coverage
power maps, and gradients").

Everything in this directory is marked ``slow``: it is the heaviest block
of the suite (both this repo's pipeline and the reference's pure-JAX
chain get jitted on CPU). ``pytest -m "not slow"`` keeps a fast default
signal; the full suite (including this directory) runs in the round gate.
"""

import pathlib

import pytest

from .loader import load_reference, reference_available

_HERE = pathlib.Path(__file__).parent


def pytest_collection_modifyitems(items):
    # The hook receives the GLOBAL item list (conftest hooks are not
    # directory-scoped) — mark only items collected from this directory.
    for item in items:
        if _HERE in pathlib.Path(str(item.fspath)).parents:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def ref():
    if not reference_available():
        pytest.skip("DiffeRT reference sources not available")
    return load_reference()
