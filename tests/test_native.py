"""Tests for the native C++ IO extension (with fallback parity)."""

import numpy as np
import pytest

from garment4d_tpu.data import native
from garment4d_tpu.data.obj_io import write_obj


@pytest.fixture(scope="module")
def built():
    return native.ensure_built()


class TestNativeIO:
    def test_read_bin(self, tmp_path, rng, built):
        data = rng.randn(57, 3).astype(np.float32)
        p = str(tmp_path / "g.bin")
        data.tofile(p)
        got = native.read_bin(p)
        np.testing.assert_array_equal(got, data)

    def test_read_bin_batch(self, tmp_path, rng, built):
        arrays = [rng.randn(n, 3).astype(np.float32) for n in (5, 30, 1)]
        paths = []
        for i, a in enumerate(arrays):
            p = str(tmp_path / f"{i}.bin")
            a.tofile(p)
            paths.append(p)
        got = native.read_bin_batch(paths, threads=2)
        for g, a in zip(got, arrays):
            np.testing.assert_array_equal(g, a)

    def test_parse_obj_quads_and_tris(self, tmp_path, rng, built):
        verts = rng.randn(9, 3).astype(np.float32)
        faces = [[0, 1, 2], [2, 3, 4, 5], [6, 7, 8]]
        p = str(tmp_path / "m.obj")
        write_obj(p, verts, faces)
        got_v, got_f = native.parse_obj(p)
        np.testing.assert_allclose(got_v, verts, rtol=1e-4, atol=1e-6)
        assert got_f == faces

    def test_parse_obj_with_texcoords(self, tmp_path, built):
        p = str(tmp_path / "t.obj")
        with open(p, "w") as f:
            f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nvt 0 0\nf 1/1 2/1 3/1\n")
        v, faces = native.parse_obj(p)
        assert v.shape == (3, 3)
        assert faces == [[0, 1, 2]]

    def test_barycentric_matches_numpy(self, rng, built):
        verts = rng.randn(40, 3).astype(np.float32)
        ind = rng.randint(0, 40, size=(25, 3)).astype(np.int64)
        w = rng.rand(25, 3)
        w /= w.sum(1, keepdims=True)
        got = native.barycentric(verts, ind, w)
        want = np.einsum("mk,mkc->mc", w, verts[ind])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_native_actually_built(self, built):
        # the image ships g++; the extension must really build here
        assert built, "native extension failed to build"
