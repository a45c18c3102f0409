"""Property-based robustness tests: PFM codec round-trips/fuzz, config
parser properties (ROADMAP item 9; no hypothesis dependency in the image,
so seeded random generation stands in)."""

import io
import numpy as np
import pytest

from cermvs_tpu.config import (
    ConfigError, bind_parameter, clear_config, configurable,
    parse_config_files_and_bindings, query_parameter)
from cermvs_tpu.io.pfm import read_pfm, write_pfm


class TestPFMRoundTrip:
    @pytest.mark.parametrize("seed", range(8))
    def test_random_shapes_grey(self, tmp_path, seed):
        rng = np.random.RandomState(seed)
        h, w = rng.randint(1, 200), rng.randint(1, 200)
        img = rng.randn(h, w).astype(np.float32)
        # inject specials the pipeline produces (0 = invalid depth) and
        # extreme magnitudes
        img[rng.rand(h, w) < 0.1] = 0.0
        img.flat[0] = 3.4e38
        p = tmp_path / "x.pfm"
        write_pfm(p, img)
        out = read_pfm(p)
        np.testing.assert_array_equal(out, img)

    @pytest.mark.parametrize("seed", range(4))
    def test_random_shapes_color(self, tmp_path, seed):
        rng = np.random.RandomState(100 + seed)
        h, w = rng.randint(1, 64), rng.randint(1, 64)
        img = rng.randn(h, w, 3).astype(np.float32)
        p = tmp_path / "c.pfm"
        write_pfm(p, img)
        np.testing.assert_array_equal(read_pfm(p), img)

    def test_hw1_written_as_grey(self, tmp_path):
        img = np.ones((4, 5, 1), np.float32)
        p = tmp_path / "g.pfm"
        write_pfm(p, img)
        assert read_pfm(p).shape == (4, 5)

    def test_rejects_non_float32(self, tmp_path):
        with pytest.raises(ValueError):
            write_pfm(tmp_path / "b.pfm", np.ones((2, 2), np.float64))

    def test_rejects_bad_channel_count(self, tmp_path):
        with pytest.raises(ValueError):
            write_pfm(tmp_path / "b.pfm", np.ones((2, 2, 4), np.float32))

    @pytest.mark.parametrize("blob", [
        b"",                                   # empty
        b"P5\n2 2\n-1.0\n" + b"\0" * 16,       # wrong magic
        b"PF\n",                               # truncated header
        b"Pf\nxx yy\n-1.0\n",                  # non-numeric dims
        b"Pf\n2\n-1.0\n" + b"\0" * 16,         # missing height
    ])
    def test_malformed_headers_raise(self, tmp_path, blob):
        p = tmp_path / "bad.pfm"
        p.write_bytes(blob)
        with pytest.raises((ValueError, IndexError)):
            read_pfm(p)

    def test_truncated_payload_fails_loud(self, tmp_path):
        img = np.ones((8, 8), np.float32)
        p = tmp_path / "t.pfm"
        write_pfm(p, img)
        data = p.read_bytes()
        p.write_bytes(data[: len(data) - 10])
        with pytest.raises((ValueError, Exception)):
            read_pfm(p)


class TestConfigProperties:
    def setup_method(self):
        clear_config()

    def teardown_method(self):
        clear_config()

    def test_literal_round_trip(self, tmp_path):
        values = {
            "a": 2, "b": -3.5, "c": "s", "d": [1, 2], "e": (1, 2),
            "f": {"k": 1}, "g": True, "h": None,
        }
        lines = [f"roundtrip_fn.{k} = {v!r}" for k, v in values.items()]
        f = tmp_path / "c.gin"
        f.write_text("\n".join(lines) + "\n")
        parse_config_files_and_bindings([str(f)], [])
        for k, v in values.items():
            assert query_parameter(f"roundtrip_fn.{k}") == v

    def test_binding_overrides_default_and_call_wins(self):
        @configurable("fuzz_fn1")
        def fn(x: int = 1):
            return x

        assert fn() == 1
        bind_parameter("fuzz_fn1.x", 7)
        assert fn() == 7
        assert fn(x=3) == 3  # explicit call arg beats binding

    def test_p_binding_precedence_over_files(self, tmp_path):
        @configurable("fuzz_fn2")
        def fn(x: int = 1):
            return x

        f = tmp_path / "c.gin"
        f.write_text("fuzz_fn2.x = 5\n")
        parse_config_files_and_bindings([str(f)], ["fuzz_fn2.x = 9"])
        assert fn() == 9

    def test_include(self, tmp_path):
        inner = tmp_path / "inner.gin"
        inner.write_text("fuzz_fn3.x = 11\n")
        outer = tmp_path / "outer.gin"
        outer.write_text(f"include '{inner}'\n")

        @configurable("fuzz_fn3")
        def fn(x: int = 1):
            return x

        parse_config_files_and_bindings([str(outer)], [])
        assert fn() == 11

    def test_comments_and_blank_lines(self, tmp_path):
        f = tmp_path / "c.gin"
        f.write_text("# comment\n\nfuzz_fn4.x = 2  # trailing\n")

        @configurable("fuzz_fn4")
        def fn(x: int = 1):
            return x

        parse_config_files_and_bindings([str(f)], [])
        assert fn() == 2

    @pytest.mark.parametrize("line", [
        "justaname", "a.b c", "a.b = ", "a.b = [1,", "= 3",
    ])
    def test_malformed_lines_raise(self, tmp_path, line):
        f = tmp_path / "c.gin"
        f.write_text(line + "\n")
        with pytest.raises((ConfigError, SyntaxError, ValueError)):
            parse_config_files_and_bindings([str(f)], [])

    def test_unknown_binding_skipped_with_skip_unknown(self, tmp_path):
        f = tmp_path / "c.gin"
        f.write_text("not_registered_anywhere.x = 3\n")
        # skip_unknown=True is the reference's behavior (train.py:131-133):
        # bindings for unregistered names must not fail parsing
        parse_config_files_and_bindings([str(f)], [], skip_unknown=True)
