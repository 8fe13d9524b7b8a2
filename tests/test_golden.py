"""Golden-image regression tests (SURVEY.md §4: the reference only had
human-judged images; these lock pixel-level behavior on the CPU backend).

Regenerate with tools/gen_golden.py after intentional estimator changes.
"""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _render(name):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import gen_golden

    mat = gen_golden.checker_material()
    for n, scene in gen_golden.scenes():
        if n == name:
            return np.asarray(scene.render(mat, res=(32, 32), spp=16, seed=7))
    raise KeyError(name)


@pytest.mark.parametrize(
    "name",
    ["collocated_sphere", "direct_cbox", "path_cbox", "direct_env_sphere"],
)
def test_golden(name):
    expected = np.load(os.path.join(GOLDEN, f"{name}.npy"))
    got = _render(name)
    # identical sampler streams: only float reassociation drift is allowed
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-4)
