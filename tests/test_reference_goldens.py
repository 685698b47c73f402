"""Golden-value parity against the reference's own docstring outputs
(reference: each modules/*.py Examples block; run upstream by
`make test-example`, Makefile:81-84).  See tests/reference_goldens.py."""

from __future__ import annotations

import pytest

from tests import reference_goldens as G

CASES = dict(G.collect_cases())

# Examples that cannot be compared numerically in this harness, with the
# reason.  Keep this list SHORT and justified — every entry is an
# acknowledged hole in the golden oracle.
SKIP = {
    "griffin": "random initial phase inside the op (no seed in example)",
}

# Cases needing a looser comparison than exact golden values, with the
# reason; each has a bespoke assertion below.
CUSTOM = {
    "pitch": "voicing decision at the zero-padded edge frame is "
             "algorithm-specific (YIN calls 3 real periods voiced; the "
             "reference's pretrained FCNF0 calls the frame unvoiced)",
    "lbg": "LBG split perturbations differ; assert our codebook's "
           "distortion is <= the reference's golden distortion instead",
    "ica": "FastICA init rides the torch RNG stream in the reference; "
           "assert the unmixing property instead of golden W values",
}


@pytest.mark.parametrize("case_id", sorted(CASES))
def test_reference_golden(case_id):
    if case_id in SKIP:
        pytest.skip(SKIP[case_id])
    if case_id in CUSTOM:
        return CUSTOM_CHECKS[case_id]()
    compared = G.run_case(CASES[case_id])
    if compared == 0:
        pytest.skip("no machine-comparable expected outputs")


def _check_pitch_golden():
    """Frame count and voiced pitch values must match the reference
    example (pitch.py Examples); voicing flags at edge frames are free."""
    import numpy as np
    import diffsptk_tpu

    want = np.array([0.0, 100, 100, 100, 100, 100, 0])
    got = np.round(np.asarray(
        diffsptk_tpu.Pitch(160, 8000, out_format="f0")(
            diffsptk_tpu.sin(1000, 80))))
    assert got.shape == want.shape, (got.shape, want.shape)
    both = (got > 0) & (want > 0)
    assert both.sum() >= 5
    np.testing.assert_allclose(got[both], want[both], atol=1.0)


def _check_lbg_golden():
    """Same data as lbg.py's Examples; our 2-level codebook must cluster
    at least as well as the reference's golden distortion (4.2804)."""
    import jax.numpy as jnp
    import numpy as np
    import diffsptk_tpu

    x = np.array([[-0.5, 0.3], [0.0, 0.7], [0.2, -0.1], [3.4, 2.0],
                  [-2.8, 1.0], [2.9, -3.0], [2.2, -2.5], [1.5, -1.6],
                  [1.8, 0.5], [1.3, 0.0]])
    cb, idx, dist = diffsptk_tpu.LindeBuzoGrayAlgorithm(1, 2)(
        jnp.asarray(x), return_indices=True)
    cb, idx = np.asarray(cb), np.asarray(idx)
    assert cb.shape == (2, 2)
    distortion = np.mean(np.sum((x - cb[idx]) ** 2, axis=-1))
    assert distortion <= 4.2804 + 1e-3, distortion


def _check_ica_golden():
    """Same data as ica.py's Examples.  The example data is rank-1 (the
    rows are collinear), so there is exactly ONE recoverable source and
    the reference's own golden s has perfectly correlated columns; the
    invariant both must satisfy is that every nonzero recovered source
    is proportional to the golden dominant source [1.2169, 0, -1.2169]."""
    import jax.numpy as jnp
    import numpy as np
    import diffsptk_tpu

    x = np.arange(1.0, 7.0).reshape(-1, 2)
    ica = diffsptk_tpu.IndependentComponentAnalysis(order=1, n_comp=2,
                                                    n_iter=10)
    ica(jnp.asarray(x))
    s = np.asarray(ica.transform(jnp.asarray(x)))
    assert s.shape == (3, 2)
    assert np.allclose(s.mean(axis=0), 0.0, atol=1e-6)
    golden = np.array([1.2169, 0.0, -1.2169])
    for j in range(2):
        col = s[:, j]
        n = np.linalg.norm(col)
        if n < 1e-9:
            continue
        corr = abs(col @ golden) / (n * np.linalg.norm(golden))
        assert corr > 0.999, (j, col)


CUSTOM_CHECKS = {
    "pitch": _check_pitch_golden,
    "lbg": _check_lbg_golden,
    "ica": _check_ica_golden,
}


def test_coverage_floor():
    """The golden oracle must keep covering a healthy slice of the
    reference's example corpus — guard against silent collection rot."""
    assert len(CASES) >= 100, len(CASES)
