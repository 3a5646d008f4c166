"""IO readers/writers: reference example files load and round-trip."""

import numpy as np
import pytest

from hmcmt2d_tpu.constants import SIGMA_AIR
from hmcmt2d_tpu.io import read_data, read_model, read_startup, write_data, write_model
from hmcmt2d_tpu.io.startup import parse_startup

DPRISM = "/root/reference/HMCMT/examples/dprism3d"
COPROD = "/root/reference/HMCMT/examples/coprod2"


def test_read_dprism_model():
    mesh, sigma2d = read_model(f"{DPRISM}/dprism2d_G96x49.mod")
    assert mesh.ny == 96
    assert mesh.nz == 49 + 7
    assert mesh.n_air == 7
    assert sigma2d.shape == (56, 96)
    assert np.all(sigma2d[:7] == SIGMA_AIR)
    # origin shifted up by total air depth
    np.testing.assert_allclose(float(mesh.origin[1]), 144400.0)
    np.testing.assert_allclose(float(mesh.origin[0]), 51000.0)
    # background is 100 Ohm.m
    assert np.isclose(np.median(sigma2d[7:]), 0.01)


def test_read_dprism_data():
    data, obs, err = read_data(f"{DPRISM}/dprism2dobs.dat")
    assert data.n_rx == 41
    assert data.n_freq == 11
    assert data.data_type == "Impedance"
    assert data.data_comp == ("ZXY", "ZYX")
    assert data.n_data == 902
    assert data.comp_te and data.comp_tm
    assert obs.dtype.kind == "c"
    np.testing.assert_allclose(obs[0], 2.004879e-01 + 1.986622e-01j)
    np.testing.assert_allclose(err[1], 1.403792e-02)
    # flat indices are unique and within the cube
    fi = data.flat_index
    assert len(np.unique(fi)) == len(fi)
    assert fi.max() < data.n_freq * data.n_rx * data.n_comp


def test_read_coprod_startup():
    cfg, mesh, sigma2d, data, obs, err = read_startup(f"{COPROD}/startupfile")
    assert cfg.burnin == 100 and cfg.total_samples == 10000
    np.testing.assert_allclose(cfg.sig_bounds, (1e-4, 10.0))
    assert cfg.dt == 0.015
    assert cfg.timestep == (6, 10)
    assert cfg.reg_param == 1.0
    assert cfg.sig_fix == (SIGMA_AIR,)
    assert data.n_rx == 20 and data.n_freq == 12
    assert mesh.ny == 76


def test_model_roundtrip(tmp_path):
    mesh, sigma2d = read_model(f"{DPRISM}/dprism2d_G96x49.mod")
    p = tmp_path / "out.mod"
    write_model(p, mesh, sigma2d)
    mesh2, sigma2d2 = read_model(p)
    np.testing.assert_allclose(np.asarray(mesh2.y_len), np.asarray(mesh.y_len))
    np.testing.assert_allclose(np.asarray(mesh2.z_len), np.asarray(mesh.z_len))
    np.testing.assert_allclose(np.asarray(mesh2.origin), np.asarray(mesh.origin))
    np.testing.assert_allclose(sigma2d2, sigma2d, rtol=0.005)  # %4.2e format


def test_data_roundtrip(tmp_path):
    data, obs, err = read_data(f"{DPRISM}/dprism2dobs.dat")
    p = tmp_path / "out.dat"
    write_data(p, data, obs, err)
    data2, obs2, err2 = read_data(p)
    np.testing.assert_allclose(obs2, obs, rtol=1e-6)
    np.testing.assert_allclose(err2, err, rtol=1e-6)
    np.testing.assert_array_equal(data2.freq_id, data.freq_id)
    np.testing.assert_array_equal(data2.rx_id, data.rx_id)
    np.testing.assert_array_equal(data2.dt_id, data.dt_id)
    np.testing.assert_allclose(data2.rx_loc, data.rx_loc)
    np.testing.assert_allclose(data2.freqs, data.freqs, rtol=1e-4)


def test_default_error_floor(tmp_path):
    data, obs, err = read_data(f"{DPRISM}/dprism2dobs.dat")
    p = tmp_path / "out.dat"
    write_data(p, data, obs)  # no errors given -> 3% amplitude
    _, _, err2 = read_data(p)
    np.testing.assert_allclose(err2, 0.03 * np.abs(obs), rtol=1e-6)


def test_missing_startup_fields(tmp_path):
    p = tmp_path / "startupfile"
    p.write_text("burninsamples: 10\n")
    with pytest.raises(ValueError, match="datafile"):
        parse_startup(p)


def test_truncated_inputs_raise_located_errors(tmp_path):
    """A file ending mid-block raises a ValueError naming the file, not a
    raw StopIteration (failure-detection hygiene)."""
    import pytest

    from hmcmt2d_tpu.io.data_io import read_data
    from hmcmt2d_tpu.io.model_io import read_model

    bad_data = tmp_path / "trunc.dat"
    bad_data.write_text(
        "Receiver Location (m):  3\n  0.0 0.0\n  10.0 0.0\n")
    with pytest.raises(ValueError, match="trunc.dat.*mid-block"):
        read_data(bad_data)

    bad_model = tmp_path / "trunc.mod"
    bad_model.write_text("NY:  4\n 100.0 100.0\n")
    with pytest.raises(ValueError, match="trunc.mod.*mid-block"):
        read_model(bad_model)
