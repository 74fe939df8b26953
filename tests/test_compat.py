"""Drop-in compatibility checks against the original reference data
files (skipped when the reference checkout is absent)."""

import os

import numpy as np
import pytest

from pinn import data as pdata

REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_original_burgers_mat_loads_transparently():
    """The reference's burgers_shock.mat loads through the same loader
    and matches our regenerated dataset to solver precision."""
    x, t, usol = pdata.load_burgers(
        os.path.join(REF, "1d-burgers", "data", "burgers_shock.mat"))
    x2, t2, usol2 = pdata.load_burgers()
    np.testing.assert_array_equal(x, x2)
    np.testing.assert_array_equal(t, t2)
    assert np.abs(usol - usol2).max() < 1e-9


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_original_nls_mat_loads_transparently():
    x, t, uu = pdata.load_schrodinger(
        os.path.join(REF, "1dcomplex-schrodinger", "data", "NLS.mat"))
    x2, t2, uu2 = pdata.load_schrodinger()
    np.testing.assert_array_equal(x, x2)
    np.testing.assert_allclose(t, t2, atol=1e-15)
    assert np.abs(uu - uu2).max() < 1e-5


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_prep_on_original_mat_same_train_set():
    """Same seed + original .mat => the same supervised train set as
    with our regenerated data (coordinates exactly; values to solver
    precision)."""
    np.random.seed(1234)
    d_ref = pdata.burgers_cont_inference(
        50, 200, path=os.path.join(REF, "1d-burgers", "data",
                                   "burgers_shock.mat"))
    np.random.seed(1234)
    d_own = pdata.burgers_cont_inference(50, 200)
    np.testing.assert_array_equal(d_ref.X_u_train, d_own.X_u_train)
    np.testing.assert_array_equal(d_ref.X_f, d_own.X_f)
    assert np.abs(d_ref.u_train - d_own.u_train).max() < 1e-9
