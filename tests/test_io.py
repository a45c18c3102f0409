"""PFM / PLY round-trip tests + config system tests."""

import numpy as np
import pytest

from cermvs_tpu import config as cfg
from cermvs_tpu.io import read_pfm, write_pfm, read_ply, write_ply


def test_pfm_roundtrip(tmp_path, rng):
    img = rng.rand(17, 23).astype(np.float32)
    p = tmp_path / "d.pfm"
    write_pfm(p, img)
    back = read_pfm(p)
    np.testing.assert_array_equal(back, img)


def test_pfm_color_roundtrip(tmp_path, rng):
    img = rng.rand(5, 7, 3).astype(np.float32)
    p = tmp_path / "c.pfm"
    write_pfm(p, img)
    np.testing.assert_array_equal(read_pfm(p), img)


def test_pfm_rejects_float64(tmp_path):
    with pytest.raises(ValueError):
        write_pfm(tmp_path / "x.pfm", np.zeros((2, 2)))


def test_pfm_reads_reference_writer(tmp_path, rng):
    """Cross-check with the exact byte layout the reference writes
    (utils/frame_utils.py:138-163): flipped rows, negative scale."""
    img = rng.rand(4, 6).astype(np.float32)
    p = tmp_path / "ref.pfm"
    with open(p, "wb") as f:
        f.write(b"Pf\n")
        f.write(b"%d %d\n" % (img.shape[1], img.shape[0]))
        f.write(b"%f\n" % -1.0)
        np.flipud(img).tofile(f)
    np.testing.assert_array_equal(read_pfm(p), img)


def test_ply_roundtrip(tmp_path, rng):
    xyz = rng.randn(100, 3).astype(np.float32)
    rgb = (rng.rand(100, 3) * 255).astype(np.uint8)
    p = tmp_path / "cloud.ply"
    write_ply(p, xyz, rgb)
    x2, c2 = read_ply(p)
    np.testing.assert_array_equal(x2, xyz)
    np.testing.assert_array_equal(c2, rgb)


# ---------------- config system ----------------

def test_config_binding_applies(tmp_path):
    cfg.clear_config()

    @cfg.configurable
    def f(a=1, b=2):
        return a, b

    gin = tmp_path / "t.gin"
    gin.write_text("f.a = 10\nf.b = [1, 2]\n")
    cfg.parse_config_file(str(gin))
    assert f() == (10, [1, 2])
    # explicit call-site args win
    assert f(a=5) == (5, [1, 2])
    cfg.clear_config()
    assert f() == (1, 2)


def test_config_class_and_cli():
    cfg.clear_config()

    @cfg.configurable
    class C:
        def __init__(self, x=0):
            self.x = x

    cfg.parse_config_files_and_bindings([], ["C.x = 42"])
    assert C().x == 42
    cfg.clear_config()


def test_config_strings_and_tuples():
    cfg.clear_config()

    @cfg.configurable
    def g(name="x", subset=None):
        return name, subset

    cfg.parse_config(['g.name = "DTUTest"', "g.subset = (0, 10, 1)"])
    assert g() == ("DTUTest", (0, 10, 1))
    cfg.clear_config()


def test_config_unknown_param_raises():
    cfg.clear_config()

    @cfg.configurable
    def h(a=1):
        return a

    cfg.parse_config(["h.nope = 3"])
    with pytest.raises(cfg.ConfigError):
        h()
    cfg.clear_config()


def test_flow_io_roundtrip(tmp_path, rng):
    from cermvs_tpu.io.flow import (
        read_flo, write_flo, read_flow_kitti, write_flow_kitti)

    flow = rng.randn(9, 13, 2).astype(np.float32)
    write_flo(tmp_path / "f.flo", flow)
    np.testing.assert_array_equal(read_flo(tmp_path / "f.flo"), flow)

    flow_q = np.round(flow * 64) / 64  # KITTI quantization
    write_flow_kitti(tmp_path / "f.png", flow_q)
    back, valid = read_flow_kitti(tmp_path / "f.png")
    np.testing.assert_allclose(back, flow_q, atol=1 / 64)
    assert valid.all()


def test_read_gen_dispatch(tmp_path, rng):
    from cermvs_tpu.io.flow import read_gen
    from cermvs_tpu.io.pfm import write_pfm

    img = rng.rand(6, 8).astype(np.float32)
    write_pfm(tmp_path / "d.pfm", img)
    np.testing.assert_array_equal(read_gen(tmp_path / "d.pfm"), img)
