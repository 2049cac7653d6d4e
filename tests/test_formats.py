"""Format round-trips: .simlod read/write, LAS read/write, las2simlod converter,
synthetic generator sanity, streaming pipeline end-to-end."""
import numpy as np
import pytest

from simlod_tpu.formats import las, simlod, synthetic
from simlod_tpu.io.streaming import PointStream, scan_paths
from simlod_tpu.tools import las2simlod


def make_cloud(rng, n=5000):
    xyz = (rng.random((n, 3)) * [100.0, 50.0, 20.0] + [500.0, -200.0, 30.0]
           ).astype(np.float64)
    rgba = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    return xyz, rgba


def test_simlod_roundtrip(tmp_path, rng):
    xyz, rgba = make_cloud(rng)
    p = str(tmp_path / "a.simlod")
    simlod.write(p, xyz, rgba)
    info = simlod.load_info(p)
    assert info.num_points == len(xyz)
    np.testing.assert_allclose(info.box_min, [0, 0, 0], atol=1e-5)
    np.testing.assert_allclose(info.box_max, xyz.max(0) - xyz.min(0), rtol=1e-5)
    x2, c2 = simlod.read_points(p)
    np.testing.assert_allclose(x2, (xyz - xyz.min(0)).astype(np.float32), atol=1e-4)
    np.testing.assert_array_equal(c2, rgba)
    # ranged read
    x3, c3 = simlod.read_points(p, first=100, count=50)
    np.testing.assert_array_equal(c3, rgba[100:150])


def test_las_roundtrip(tmp_path, rng):
    xyz, rgba = make_cloud(rng)
    rgba = rgba & 0x00FFFFFF  # LAS format 2 has no alpha
    p = str(tmp_path / "a.las")
    las.write(p, xyz, rgba)
    hdr = las.load_header(p)
    assert hdr.num_points == len(xyz)
    assert hdr.format == 2
    np.testing.assert_allclose(hdr.box_min, xyz.min(0), atol=1e-6)
    x2, c2 = las.read_points(p)
    # default translation rebases to the origin, scale 0.001 quantization
    np.testing.assert_allclose(x2, xyz - xyz.min(0), atol=2e-3)
    np.testing.assert_array_equal(c2 & 0xFFFFFF, rgba)
    assert (c2 >> 24 == 255).all()


def test_las2simlod_tool(tmp_path, rng):
    xyz, rgba = make_cloud(rng, 3000)
    rgba = rgba & 0x00FFFFFF
    src = str(tmp_path / "a.las")
    dst = str(tmp_path / "a.simlod")
    las.write(src, xyz, rgba)
    n = las2simlod.convert(src, dst, batch=1000, verbose=False)
    assert n == 3000
    info = simlod.load_info(dst)
    assert info.num_points == 3000
    x2, c2 = simlod.read_points(dst)
    np.testing.assert_allclose(x2, xyz - xyz.min(0), atol=2e-3)
    np.testing.assert_array_equal(c2 & 0xFFFFFF, rgba)


def test_scan_paths_dir(tmp_path, rng):
    xyz, rgba = make_cloud(rng, 100)
    simlod.write(str(tmp_path / "a.simlod"), xyz, rgba)
    simlod.write(str(tmp_path / "b.simlod"), xyz + 1000.0, rgba)
    entries = scan_paths([str(tmp_path)])
    assert len(entries) == 2
    assert {e.kind for e in entries} == {"simlod"}


def test_stream_end_to_end(tmp_path, rng):
    xyz, rgba = make_cloud(rng, 30_000)
    simlod.write(str(tmp_path / "a.simlod"), xyz, rgba)
    stream = PointStream([str(tmp_path / "a.simlod")], step_points=1 << 12,
                         batch_points=7_000)
    total = 0
    seen_colors = []
    for xd, yd, zd, cd, count in stream:
        assert xd.shape == (1 << 12,)
        total += count
        seen_colors.append(np.asarray(cd)[:count])
    assert total == 30_000
    # stream preserves content (order within the stream is file order)
    got = np.concatenate(seen_colors)
    np.testing.assert_array_equal(np.sort(got), np.sort(rgba))
    s = stream.stats()
    assert s["points_loaded"] == 30_000


def test_stream_union_box(tmp_path, rng):
    xyz, rgba = make_cloud(rng, 1000)
    simlod.write(str(tmp_path / "a.simlod"), xyz, rgba)
    simlod.write(str(tmp_path / "b.simlod"), xyz + 500.0, rgba)
    stream = PointStream([str(tmp_path)], step_points=1 << 12)
    pts = []
    for xd, yd, zd, cd, count in stream:
        pts.append(np.stack([np.asarray(xd)[:count], np.asarray(yd)[:count],
                             np.asarray(zd)[:count]], -1))
    allp = np.concatenate(pts)
    # all coordinates rebased into the union frame starting at ~0
    assert allp.min() >= -1e-3
    ext = stream.box_max - stream.box_min
    assert (allp.max(0) <= ext + 1e-2).all()


def test_synthetic_shape(rng):
    xyz, rgba = synthetic.terrain(10_000, seed=3)
    assert xyz.shape == (10_000, 3) and xyz.dtype == np.float32
    assert rgba.shape == (10_000,) and rgba.dtype == np.uint32
    assert (rgba >> 24 == 255).all()
    # scan-order locality: consecutive points are close in x/y
    d = np.linalg.norm(np.diff(xyz[:, :2], axis=0), axis=1)
    assert np.median(d) < 30.0


def test_laz_roundtrip(tmp_path):
    """LAZ round-trip through the native LASzip codec — no optional deps
    (VERDICT round 1 item 7; reference decodes LAZ via vendored laszip,
    main_progressive_octree.cpp:879-926)."""
    from simlod_tpu import native
    from simlod_tpu.formats import las, laz
    assert native.laz_available(), "native LAZ codec failed to build"
    rng = np.random.default_rng(9)
    n = 130_000  # several 50k chunks
    xyz = np.cumsum(rng.normal(0, 0.2, (n, 3)), axis=0).astype(np.float64)
    rgba = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32) \
        | np.uint32(0xFF000000)
    p_laz = str(tmp_path / "cloud.laz")
    p_las = str(tmp_path / "cloud.las")
    laz.write(p_laz, xyz, rgba)
    las.write(p_las, xyz, rgba)
    # compressed really is smaller than the raw LAS
    import os
    assert os.path.getsize(p_laz) < 0.7 * os.path.getsize(p_las)

    hdr = laz.load_header(p_laz)
    assert hdr.num_points == n
    xyz_z, rgba_z = laz.read_points(p_laz)
    xyz_l, rgba_l = las.read_points(p_las)
    np.testing.assert_array_equal(rgba_z, rgba_l)
    np.testing.assert_allclose(xyz_z, xyz_l, atol=1e-6)

    # ranged reads slice the cached decode
    xs, rs = laz.read_points(p_laz, first=60_000, count=1000)
    np.testing.assert_array_equal(rs, rgba_l[60_000:61_000])
    np.testing.assert_allclose(xs, xyz_l[60_000:61_000], atol=1e-6)


def test_laz_gpstime_roundtrip(tmp_path):
    """Format-1 (gpstime) records survive the codec byte-exactly."""
    from simlod_tpu import native
    if not native.laz_available():
        import pytest
        pytest.skip("no C compiler")
    rng = np.random.default_rng(4)
    n = 20_000
    rec = np.zeros((n, 28), np.uint8)
    xyz_i = np.cumsum(rng.integers(-40, 50, (n, 3)), axis=0).astype("<i4")
    rec[:, :12] = xyz_i.view(np.uint8).reshape(n, 12)
    rec[:, 14] = 0b001001
    t = (1e9 + np.cumsum(np.abs(rng.normal(5e-4, 2e-4, n)))).astype("<f8")
    rec[:, 20:28] = t.view(np.uint8).reshape(n, 8)
    types, sizes = [6, 7], [20, 8]
    stream = native.laz_encode(rec, 5000, types, sizes)
    back = native.laz_decode(stream[8:], n, 5000, types, sizes)
    np.testing.assert_array_equal(back, rec)


def test_laz_chunk_table_parallel_decode(tmp_path):
    """The chunk table decodes to exact per-chunk byte sizes and the
    thread-parallel chunk-range decode is bit-identical to sequential
    (chunks are independently coded — how the reference's loader threads
    reach ~30 MP/s aggregate, main_progressive_octree.cpp:811-958)."""
    from simlod_tpu import native
    from simlod_tpu.formats import las, laz
    if not native.laz_available():
        import pytest
        pytest.skip("no C compiler")
    rng = np.random.default_rng(12)
    n = 205_000  # 5 chunks, last partial
    xyz = np.cumsum(rng.normal(0, 0.3, (n, 3)), axis=0).astype(np.float64)
    rgba = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    p = str(tmp_path / "cloud.laz")
    laz.write(p, xyz, rgba)

    hdr = laz.load_header(p)
    compressor, chunk_size, types, sizes = laz._read_laszip_vlr(p, hdr)
    with open(p, "rb") as f:
        f.seek(hdr.offset_to_points)
        data = np.frombuffer(f.read(), np.uint8)
    table_abs = int(np.frombuffer(data[:8].tobytes(), "<i8")[0])
    data = data[8:]
    table_off = table_abs - hdr.offset_to_points - 8
    nchunks = (n + chunk_size - 1) // chunk_size
    csizes = native.laz_chunk_table(data[table_off:], nchunks)
    assert csizes is not None and len(csizes) == nchunks == 5
    assert int(csizes.sum()) == table_off  # sizes tile the point stream exactly

    seq = native.laz_decode(data, n, chunk_size, types, sizes)
    par = laz._decode_chunked(hdr, data, table_off, chunk_size, types, sizes,
                              workers=3)
    np.testing.assert_array_equal(seq, par)

    # a corrupt-but-decodable chunk table (sizes no longer tile the stream up
    # to the table) must NOT seek parallel workers to wrong offsets: the
    # chunked path falls back to sequential decode and still returns exact data
    bad = np.array(data, copy=True)
    bad[table_off:table_off + 16] = bad[table_off:table_off + 16] ^ 0xA5
    got = laz._decode_chunked(hdr, bad, table_off, chunk_size, types, sizes,
                              workers=3)
    np.testing.assert_array_equal(seq, got)
