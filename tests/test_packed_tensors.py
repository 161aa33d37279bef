"""PackedTensors container tests, including byte parity vs tf.train.Example
(TF is available in the dev image; the check is skipped when it is not)."""

import numpy as np
import pytest

from compression_tpu.util.packed_tensors import PackedTensors


class TestPackedTensors:
    def test_roundtrip(self):
        p = PackedTensors()
        p.model = "bls2017"
        p.pack([
            [b"\x01\x02\xff"],
            np.asarray([768, 512], np.int32),
            np.asarray([48, 32], np.int32),
        ])
        s = p.string

        q = PackedTensors(s)
        assert q.model == "bls2017"
        strings, x_shape, y_shape = q.unpack(["bytes", np.int32, np.int32])
        assert strings == [b"\x01\x02\xff"]
        np.testing.assert_array_equal(x_shape, [768, 512])
        np.testing.assert_array_equal(y_shape, [48, 32])

    def test_float_and_negative_ints(self):
        p = PackedTensors()
        p.pack([np.asarray([1.5, -2.25], np.float32),
                np.asarray([-7, 1 << 40], np.int64)])
        q = PackedTensors(p.string)
        f, i = q.unpack([np.float32, np.int64])
        np.testing.assert_allclose(f, [1.5, -2.25])
        np.testing.assert_array_equal(i, [-7, 1 << 40])

    def test_repack_clears_stale(self):
        p = PackedTensors()
        p.pack([np.asarray([1], np.int32), np.asarray([2], np.int32)])
        p.pack([np.asarray([3], np.int32)])
        q = PackedTensors(p.string)
        (only,) = q.unpack([np.int32])
        np.testing.assert_array_equal(only, [3])

    def test_wire_parity_with_tensorflow(self):
        # Protobuf map order is unspecified (TF uses hash-bucket order), so
        # the contract is mutual parseability: TF parses our bytes, we
        # parse TF's bytes, with identical content.
        tf = pytest.importorskip("tensorflow")
        example = tf.train.Example()
        example.features.feature["MD"].bytes_list.value[:] = [b"bmshj2018"]
        example.features.feature[chr(1)].bytes_list.value[:] = [
            b"abc", b"\x00\x01"]
        example.features.feature[chr(2)].int64_list.value[:] = [768, 512, -3]
        example.features.feature[chr(3)].float_list.value[:] = [0.5, -1.25]
        tf_bytes = example.SerializeToString()

        p = PackedTensors()
        p.model = "bmshj2018"
        p.pack([
            [b"abc", b"\x00\x01"],
            np.asarray([768, 512, -3], np.int64),
            np.asarray([0.5, -1.25], np.float32),
        ])

        # We parse TF's bytes.
        q = PackedTensors(tf_bytes)
        assert q.model == "bmshj2018"
        s, i, f = q.unpack(["bytes", np.int64, np.float32])
        assert s == [b"abc", b"\x00\x01"]
        np.testing.assert_array_equal(i, [768, 512, -3])
        np.testing.assert_allclose(f, [0.5, -1.25])

        # TF parses our bytes.
        example2 = tf.train.Example()
        example2.ParseFromString(p.string)
        feats = example2.features.feature
        assert feats["MD"].bytes_list.value[0] == b"bmshj2018"
        assert list(feats[chr(1)].bytes_list.value) == [b"abc", b"\x00\x01"]
        assert list(feats[chr(2)].int64_list.value) == [768, 512, -3]
        np.testing.assert_allclose(
            list(feats[chr(3)].float_list.value), [0.5, -1.25])
