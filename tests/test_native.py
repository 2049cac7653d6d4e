"""Native C decoder vs numpy decoder: identical outputs (when the .so is built)."""
import numpy as np
import pytest

from simlod_tpu import native
from simlod_tpu.formats import las


@pytest.mark.skipif(not native.available(), reason="native fastload not built")
def test_native_las_decode_matches_numpy(tmp_path, rng):
    xyz = (rng.random((5000, 3)) * [300, 80, 40] + [10, -5, 2]).astype(np.float64)
    rgba = rng.integers(0, 2**24, 5000, dtype=np.int64).astype(np.uint32)
    p = str(tmp_path / "n.las")
    las.write(p, xyz, rgba)
    hdr = las.load_header(p)
    with open(p, "rb") as f:
        f.seek(hdr.offset_to_points)
        raw = np.frombuffer(f.read(), np.uint8)

    nx, nc = native.decode_las(raw, hdr.num_points, hdr.bytes_per_point,
                               las.RGB_OFFSET[hdr.format], hdr.scale, hdr.offset,
                               -hdr.box_min)
    # numpy fallback path (bypass the native switch)
    import simlod_tpu.native as nat
    saved = nat._LIB, nat._build_or_find
    nat._LIB, nat._build_or_find = None, lambda *a: None
    try:
        px, pc = las.decode_points(hdr, raw, -hdr.box_min)
    finally:
        nat._LIB, nat._build_or_find = saved

    np.testing.assert_array_equal(nx, px)
    np.testing.assert_array_equal(nc, pc)


@pytest.mark.skipif(not native.available(), reason="native fastload not built")
def test_native_simlod_decode(rng):
    n = 1000
    rec = np.zeros(n, dtype=np.dtype([("xyz", np.float32, 3), ("rgba", np.uint32)]))
    rec["xyz"] = rng.random((n, 3), dtype=np.float32)
    rec["rgba"] = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    raw = np.frombuffer(rec.tobytes(), np.uint8)
    shift = np.array([1.0, 2.0, 3.0], np.float32)
    xyz, rgba = native.decode_simlod(raw, n, shift)
    np.testing.assert_allclose(xyz, rec["xyz"] + shift[None, :], rtol=1e-6)
    np.testing.assert_array_equal(rgba, rec["rgba"])
