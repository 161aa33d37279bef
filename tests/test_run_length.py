"""Bit coder / run-length code tests, including the reference's golden
bitstream (run_length_gamma_kernels_test.cc EncodeConsistent)."""

import numpy as np
import pytest

from compression_tpu.ops import run_length as rl


class TestBitCoder:
    def test_bits_roundtrip(self):
        w = rl.BitWriter()
        pattern = [(1, 1), (3, 5), (8, 0xAB), (16, 0x1234), (1, 0), (5, 17)]
        for count, bits in pattern:
            w.write_bits(count, bits)
        r = rl.BitReader(w.get_data())
        for count, bits in pattern:
            assert r.read_bits(count) == bits

    def test_gamma_roundtrip(self):
        w = rl.BitWriter()
        values = [1, 2, 3, 7, 8, 100, 2**20, 2**30]
        for v in values:
            w.write_gamma(v)
        r = rl.BitReader(w.get_data())
        for v in values:
            assert r.read_gamma() == v

    def test_rice_roundtrip(self):
        for parameter in [0, 1, 3, 7]:
            w = rl.BitWriter()
            values = [0, 1, 5, 63, 1000]
            for v in values:
                w.write_rice(v, parameter)
            r = rl.BitReader(w.get_data())
            for v in values:
                assert r.read_rice(parameter) == v

    def test_out_of_bits(self):
        r = rl.BitReader(b"\x01")
        r.read_bits(8)
        with pytest.raises(ValueError):
            r.read_bits(1)


class TestRunLengthGamma:
    def test_golden_bytes(self):
        # Reference golden: [-6, 3, 0, 0] <-> {0b11010001, 0b01101101}
        # (run_length_gamma_kernels_test.cc:240-266).
        data = np.asarray([-6, 3, 0, 0], np.int32)
        expected = bytes([0b11010001, 0b01101101])
        assert rl.run_length_gamma_encode(data) == expected
        np.testing.assert_array_equal(
            rl.run_length_gamma_decode(expected, (4,)), data)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_roundtrip_random(self, seed):
        rng = np.random.RandomState(seed)
        data = rng.randint(-50, 50, size=500)
        data[rng.rand(500) < 0.8] = 0  # sparse
        code = rl.run_length_gamma_encode(data)
        np.testing.assert_array_equal(
            rl.run_length_gamma_decode(code, (500,)), data)

    def test_edge_cases(self):
        for data in [[0], [0, 0, 0], [5], [-5], [1, -1, 1, -1],
                     list(range(-5, 6))]:
            data = np.asarray(data, np.int32)
            code = rl.run_length_gamma_encode(data)
            np.testing.assert_array_equal(
                rl.run_length_gamma_decode(code, data.shape), data)


class TestRunLength:
    def test_golden_bytes_gamma_mode(self):
        # Same golden as the gamma op with default attrs (-1, -1, False)
        # (run_length_kernels_test.cc:272-305).
        data = np.asarray([-6, 3, 0, 0], np.int32)
        expected = bytes([0b11010001, 0b01101101])
        assert rl.run_length_encode(data, -1, -1, False) == expected
        np.testing.assert_array_equal(
            rl.run_length_decode(expected, (4,), -1, -1, False), data)

    @pytest.mark.parametrize("rlc,mc,rlnz", [
        (-1, -1, False), (0, -1, False), (-1, 2, False), (1, 1, False),
        (-1, -1, True), (0, 0, True), (2, 3, True),
    ])
    def test_roundtrip_all_modes(self, rlc, mc, rlnz):
        rng = np.random.RandomState(abs(rlc * 16 + mc) + 7)
        data = rng.randint(-30, 30, size=300)
        data[rng.rand(300) < 0.7] = 0
        code = rl.run_length_encode(data, rlc, mc, rlnz)
        np.testing.assert_array_equal(
            rl.run_length_decode(code, (300,), rlc, mc, rlnz), data)

    def test_leading_trailing_interspersed_zeros(self):
        cases = [
            [0, 0, 5, 0, 0], [7, 0, 0], [0, 0, -7], [1, 2, 3], [0] * 10,
        ]
        for data in cases:
            data = np.asarray(data, np.int32)
            for rlnz in [False, True]:
                code = rl.run_length_encode(data, -1, -1, rlnz)
                np.testing.assert_array_equal(
                    rl.run_length_decode(code, data.shape, -1, -1, rlnz),
                    data)


class TestNativeParity:
    """Native C codecs must be byte-identical to the pure-Python path."""

    def _python_only(self, monkeypatch):
        from compression_tpu.ops import run_length as rl_mod
        monkeypatch.setattr(rl_mod, "_native", lambda: None)

    def test_gamma_native_vs_python(self, monkeypatch):
        import compression_tpu.native as native
        if native.get_lib() is None:
            pytest.skip("no C compiler available")
        rng = np.random.RandomState(5)
        data = rng.randint(-40, 40, size=400)
        data[rng.rand(400) < 0.6] = 0
        native_code = rl.run_length_gamma_encode(data)
        self._python_only(monkeypatch)
        python_code = rl.run_length_gamma_encode(data)
        assert native_code == python_code
        np.testing.assert_array_equal(
            rl.run_length_gamma_decode(native_code, (400,)), data)

    def test_rl_native_vs_python(self, monkeypatch):
        import compression_tpu.native as native
        if native.get_lib() is None:
            pytest.skip("no C compiler available")
        rng = np.random.RandomState(6)
        data = rng.randint(-25, 25, size=300)
        data[rng.rand(300) < 0.5] = 0
        for rlc, mc, rlnz in [(-1, -1, False), (0, 2, True), (1, -1, True)]:
            native_code = rl.run_length_encode(data, rlc, mc, rlnz)
            self._python_only(monkeypatch)
            python_code = rl.run_length_encode(data, rlc, mc, rlnz)
            monkeypatch.undo()
            assert native_code == python_code, (rlc, mc, rlnz)
