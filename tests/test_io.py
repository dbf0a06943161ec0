"""Round-trip tests for the pure-numpy medical IO layer."""
import struct

import numpy as np
import pytest

from medicalseg_tpu import io as medio
from medicalseg_tpu.io import dicom, metaimage, nifti, nrrd_io


def test_nifti_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    vol = rng.rand(5, 6, 7).astype(np.float32)
    spacing = (1.5, 2.0, 2.5)
    origin = (10.0, -5.0, 3.0)
    path = str(tmp_path / "vol.nii.gz")
    nifti.write(path, vol, spacing=spacing, origin=origin)
    data, meta = nifti.read(path)
    np.testing.assert_allclose(data, vol, rtol=1e-6)
    np.testing.assert_allclose(meta["spacing"], spacing, rtol=1e-5)
    np.testing.assert_allclose(meta["origin"], origin, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(meta["direction"]).reshape(3, 3), np.eye(3), atol=1e-5)


def test_nifti_int_labels(tmp_path):
    lab = np.random.RandomState(1).randint(0, 20, (4, 5, 6)).astype(
        np.int32)
    path = str(tmp_path / "lab.nii")
    nifti.write(path, lab)
    data, _ = nifti.read(path)
    np.testing.assert_array_equal(data, lab)
    assert data.dtype == np.int32


def test_metaimage_roundtrip(tmp_path):
    vol = np.random.RandomState(2).randint(-1000, 1000,
                                           (4, 5, 6)).astype(np.int16)
    for name in ("vol.mha", "vol.mhd"):
        path = str(tmp_path / name)
        metaimage.write(path, vol, spacing=(1, 1, 2.5), origin=(5, 6, 7))
        data, meta = metaimage.read(path)
        np.testing.assert_array_equal(data, vol)
        np.testing.assert_allclose(meta["spacing"], (1, 1, 2.5))
        np.testing.assert_allclose(meta["origin"], (5, 6, 7))


def test_metaimage_compressed(tmp_path):
    vol = np.random.RandomState(3).rand(4, 4, 4).astype(np.float32)
    path = str(tmp_path / "c.mha")
    metaimage.write(path, vol, compressed=True)
    data, _ = metaimage.read(path)
    np.testing.assert_allclose(data, vol)


def test_nrrd_roundtrip(tmp_path):
    vol = np.random.RandomState(4).rand(3, 4, 5).astype(np.float32)
    path = str(tmp_path / "vol.nrrd")
    nrrd_io.write(path, vol, spacing=(1.0, 2.0, 3.0))
    data, meta = nrrd_io.read(path)
    np.testing.assert_allclose(data, vol)
    np.testing.assert_allclose(meta["spacing"], (1.0, 2.0, 3.0))


def _write_fake_dicom(path, pixels, instance=1, pos=(0.0, 0.0, 0.0)):
    """Minimal explicit-VR little-endian DICOM writer for tests."""
    def elem(group, el, vr, value):
        head = struct.pack("<HH", group, el) + vr
        if vr in (b"OB", b"OW", b"SQ", b"UN", b"UT"):
            return head + b"\x00\x00" + struct.pack("<I", len(value)) + \
                value
        return head + struct.pack("<H", len(value)) + value

    rows, cols = pixels.shape
    body = b""
    body += elem(0x0018, 0x0050, b"DS", b"2.5 ")
    body += elem(0x0020, 0x0013, b"IS", str(instance).encode())
    body += elem(0x0020, 0x0032, b"DS",
                 "\\".join(str(p) for p in pos).encode())
    body += elem(0x0020, 0x0037, b"DS", b"1\\0\\0\\0\\1\\0")
    body += elem(0x0028, 0x0010, b"US", struct.pack("<H", rows))
    body += elem(0x0028, 0x0011, b"US", struct.pack("<H", cols))
    body += elem(0x0028, 0x0030, b"DS", b"0.7\\0.7 ")
    body += elem(0x0028, 0x0100, b"US", struct.pack("<H", 16))
    body += elem(0x0028, 0x0103, b"US", struct.pack("<H", 1))
    body += elem(0x7FE0, 0x0010, b"OW", pixels.astype("<i2").tobytes())

    meta = b""
    meta += elem(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.1\x00")

    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM")
        f.write(meta)
        f.write(body)


def test_dicom_series(tmp_path):
    rng = np.random.RandomState(5)
    slices = [rng.randint(-500, 500, (8, 8)).astype(np.int16)
              for _ in range(3)]
    for i, s in enumerate(slices):
        _write_fake_dicom(str(tmp_path / "s{}.dcm".format(i)), s,
                          instance=i + 1, pos=(0.0, 0.0, 2.5 * i))
    vol, meta = dicom.read_series(str(tmp_path))
    assert vol.shape == (3, 8, 8)
    np.testing.assert_allclose(vol[1], slices[1])
    np.testing.assert_allclose(meta["spacing"], (0.7, 0.7, 2.5))


def test_dispatch_read_write(tmp_path):
    vol = np.random.RandomState(6).rand(4, 4, 4).astype(np.float32)
    p = str(tmp_path / "x.nii.gz")
    medio.write_image(p, vol)
    data, meta = medio.read_image(p)
    np.testing.assert_allclose(data, vol, rtol=1e-6)
    with pytest.raises(ValueError):
        medio.read_image(str(tmp_path / "x.unknown"))


def test_native_gzip_read_parity(tmp_path):
    """Native libdeflate inflate returns byte-identical payloads to the
    gzip module, including multi-member streams."""
    import gzip as gz
    from medicalseg_tpu import data_native
    if data_native.get_lib() is None:
        pytest.skip("native loader unavailable")
    payload = np.random.RandomState(3).bytes(300000)
    p = tmp_path / "a.gz"
    with gz.open(str(p), "wb") as f:
        f.write(payload)
    got = data_native.gzip_read_bytes(str(p))
    assert got is not None and bytes(got) == payload

    p2 = tmp_path / "multi.gz"
    with open(str(p2), "wb") as f:
        f.write(gz.compress(b"hello "))
        f.write(gz.compress(b"world"))
    assert bytes(data_native.gzip_read_bytes(str(p2))) == b"hello world"


def test_native_nii_fast_path_parity(tmp_path):
    """ml_load_nii_hu_resize (one-shot inflate+parse+HU+resize) matches
    the pure reader + hu_resize_array exactly for i16/f32 voxels, and
    refuses unsupported dtypes so callers can fall back."""
    from medicalseg_tpu import data_native
    if data_native.get_lib() is None:
        pytest.skip("native loader unavailable")
    rng = np.random.RandomState(0)
    vol = rng.uniform(-1400, 800, (20, 32, 24)).astype(
        np.float32).astype(np.int16)
    for name in ("v.nii", "v.nii.gz"):
        p = str(tmp_path / name)
        nifti.write(p, vol)
        fast = data_native.load_nii_hu_resize(p, (16, 16, 16),
                                              out_dtype="float32")
        slow = data_native.hu_resize_array(
            np.ascontiguousarray(nifti.read(p)[0]), (16, 16, 16),
            out_dtype="float32")
        np.testing.assert_array_equal(fast, slow)

    volf = rng.uniform(-1400, 800, (10, 16, 16)).astype(np.float32)
    p = str(tmp_path / "f.nii.gz")
    nifti.write(p, volf)
    fast = data_native.load_nii_hu_resize(p, (8, 8, 8),
                                          out_dtype="bfloat16")
    slow = data_native.hu_resize_array(volf, (8, 8, 8),
                                       out_dtype="bfloat16")
    np.testing.assert_array_equal(np.asarray(fast, np.float32),
                                  np.asarray(slow, np.float32))

    p = str(tmp_path / "d.nii.gz")
    nifti.write(p, rng.uniform(0, 1, (4, 4, 4)).astype(np.float64))
    with pytest.raises(RuntimeError):
        data_native.load_nii_hu_resize(p, (4, 4, 4))
    # the general reader still handles it (through the native inflate)
    assert nifti.read(p)[0].dtype == np.float64
