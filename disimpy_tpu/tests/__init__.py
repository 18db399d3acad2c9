"""Convenience test runner, mirroring the reference's ``disimpy.tests``
package (reference: disimpy/tests/__init__.py:6-8).

.. note::
   Unlike the reference, which ships its tests inside the package, the
   suite lives in the repository's ``tests/`` directory (its fixtures are
   tens of MB of oracle data). ``test_all()`` therefore only works from a
   repository checkout — a pip-installed package without the repo raises
   ``RuntimeError`` pointing here. This limitation is also documented in
   the API reference (docs/reference.md).
"""

import os

__all__ = ["test_all"]


def test_all(extra_args=()):
    """Run the full fast-tier test suite with pytest.

    Parameters
    ----------
    extra_args : sequence of str
        Extra pytest command-line arguments (e.g. ``["-m", "slow"]`` for
        the full-size parity tier).

    Returns
    -------
    int
        The pytest exit code (0 = all tests passed).
    """
    import pytest

    here = os.path.dirname(os.path.abspath(__file__))
    tests_dir = os.path.join(os.path.dirname(os.path.dirname(here)), "tests")
    if not os.path.isdir(tests_dir):
        raise RuntimeError(
            "cannot locate the tests/ directory next to the package; "
            "run pytest from a repository checkout instead"
        )
    return pytest.main([tests_dir, *extra_args])
