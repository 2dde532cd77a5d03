"""Native C++ decode loader tests — builds the shared lib, compares against
the Python decode chain bit-for-bit."""
import numpy as np
import pytest

from thyroid_tpu.data.dataset import decode_image
from thyroid_tpu.native import build_native, decode_batch_native, load_native


@pytest.mark.unit
class TestNativeLoader:
    def test_builds(self):
        path = build_native()
        if path is None:
            pytest.skip("no native toolchain")
        assert path.exists()

    def test_batch_matches_python_decode(self, temp_dataset_path):
        if load_native() is None:
            pytest.skip("no native toolchain")
        from thyroid_tpu.data.corpus import scan_corpus

        paths, _, _ = scan_corpus(temp_dataset_path)
        native = decode_batch_native(paths)
        assert native is not None
        assert native.dtype == np.uint16
        py = np.stack([decode_image(p) for p in paths])[..., None]
        assert np.array_equal(native, py)

    def test_rgb_png_matches_python_decode(self, tmp_path):
        """RGB PNG: native BT.601 gray == the cv2-based Python chain
        (decode_image does cvtColor at 8-bit then *257)."""
        if load_native() is None:
            pytest.skip("no native toolchain")
        import cv2

        rs = np.random.RandomState(7)
        arr = rs.randint(0, 255, (12, 9, 3), np.uint8)  # RGB
        f = tmp_path / "rgb.png"
        cv2.imwrite(str(f), arr[..., ::-1])  # imwrite wants BGR
        native = decode_batch_native([f])
        assert native is not None
        py = decode_image(f)
        assert np.array_equal(native[0, ..., 0], py)

    def test_unsupported_format_falls_back(self, tmp_path):
        f = tmp_path / "x.jpg"
        f.write_bytes(b"\xff\xd8\xff")
        assert decode_batch_native([f]) is None

    def test_dataset_uses_native(self, temp_dataset_path, tmp_path):
        from thyroid_tpu.data import CARSThyroidDataset

        ds = CARSThyroidDataset(
            {"data_path": str(temp_dataset_path),
             "split_dir": str(tmp_path / "s"), "val_split_ratio": 0.25,
             "test_split_ratio": 0.25, "random_seed": 0}, split="all")
        arr = ds.load_images()
        assert arr.shape == (16, 64, 64, 1) and arr.dtype == np.uint16


@pytest.mark.unit
class TestNativeTiff:
    """Classic-TIFF decode (the corpus's primary format). TIFFs are written
    by a minimal in-test writer (tifffile is not in this environment), with
    cv2 as the independent read-back check where applicable."""

    @staticmethod
    def _write_tiff(path, arr, big_endian=False, compression=1,
                    rows_per_strip=None):
        import struct

        bo = ">" if big_endian else "<"
        h, w = arr.shape[:2]
        spp = 1 if arr.ndim == 2 else arr.shape[2]
        depth = 16 if arr.dtype == np.uint16 else 8
        rows_per_strip = rows_per_strip or h
        data = arr.astype(f"{bo}u{depth // 8}").tobytes()
        strips = []
        row_bytes = w * spp * (depth // 8)
        for r0 in range(0, h, rows_per_strip):
            n = min(rows_per_strip, h - r0) * row_bytes
            strips.append(data[r0 * row_bytes: r0 * row_bytes + n])

        tags = []  # (id, type, count, value_or_bytes)
        def tag(tid, ttype, count, value):
            tags.append((tid, ttype, count, value))

        n_strips = len(strips)
        # header(8) + ifd(2 + 12*n + 4) + out-of-line areas computed below
        n_tags = 9 + (1 if spp > 1 else 0)
        ifd_off = 8
        ifd_size = 2 + 12 * n_tags + 4
        extra_off = ifd_off + ifd_size
        extra = b""

        def arr_value(ttype, values):
            nonlocal extra
            fmt = "H" if ttype == 3 else "I"
            esz = 2 if ttype == 3 else 4
            raw = b"".join(struct.pack(bo + fmt, v) for v in values)
            if len(raw) <= 4:
                return raw + b"\x00" * (4 - len(raw))
            off = extra_off + len(extra)
            extra += raw
            return struct.pack(bo + "I", off)

        strip_offs = []
        data_base = None  # filled after extra is final; two-pass below

        # first pass to size the bits/strip arrays
        tag(256, 3, 1, None); tag(257, 3, 1, None); tag(258, 3, spp, None)
        tag(259, 3, 1, None); tag(262, 3, 1, None); tag(273, 4, n_strips, None)
        if spp > 1:
            tag(277, 3, 1, None)
        tag(278, 3, 1, None); tag(279, 4, n_strips, None); tag(284, 3, 1, None)

        # compute extra sizes: bits array (if spp>1 and 2*spp>4), strip arrays
        bits_raw = 2 * spp
        extra_sz = (bits_raw if bits_raw > 4 else 0)
        if n_strips * 4 > 4:
            extra_sz += 2 * n_strips * 4
        data_base = extra_off + extra_sz
        off = data_base
        for sdata in strips:
            strip_offs.append(off)
            off += len(sdata)

        values = {
            256: (3, 1, [w]), 257: (3, 1, [h]), 258: (3, spp, [depth] * spp),
            259: (3, 1, [compression]), 262: (3, 1, [1]),
            273: (4, n_strips, strip_offs), 277: (3, 1, [spp]),
            278: (3, 1, [rows_per_strip]),
            279: (4, n_strips, [len(sd) for sd in strips]),
            284: (3, 1, [1]),
        }
        out = struct.pack(bo + "2sHI", b"MM" if big_endian else b"II", 42,
                          ifd_off)
        out += struct.pack(bo + "H", n_tags)
        for tid, ttype, count, _ in tags:
            t2, c2, vals = values[tid]
            out += struct.pack(bo + "HHI", tid, t2, c2)
            out += arr_value(t2, vals)
        out += struct.pack(bo + "I", 0)  # next IFD
        out += extra
        assert len(out) == data_base, (len(out), data_base)
        for sdata in strips:
            out += sdata
        path.write_bytes(out)

    def _decode(self, tmp_path, arr, big_endian=False, name="t.tif", **kw):
        f = tmp_path / name
        self._write_tiff(f, arr, big_endian=big_endian, **kw)
        if load_native() is None:
            pytest.skip("no native toolchain")
        native = decode_batch_native([f])
        assert native is not None, f"native decode refused {name}"
        return native[0, ..., 0]

    def test_uint16_little_endian(self, tmp_path):
        rs = np.random.RandomState(0)
        arr = rs.randint(0, 65535, (37, 53), np.uint16)
        assert np.array_equal(self._decode(tmp_path, arr), arr)

    def test_uint16_big_endian_multistrip(self, tmp_path):
        rs = np.random.RandomState(1)
        arr = rs.randint(0, 65535, (64, 64), np.uint16)
        got = self._decode(tmp_path, arr, big_endian=True,
                           name="be.tiff", rows_per_strip=16)
        assert np.array_equal(got, arr)

    def test_uint8_upscales_257(self, tmp_path):
        rs = np.random.RandomState(2)
        arr = rs.randint(0, 255, (16, 24), np.uint8)
        got = self._decode(tmp_path, arr)
        assert np.array_equal(got, arr.astype(np.uint16) * 257)

    def test_rgb_collapses_to_bt601_luminance(self, tmp_path):
        """RGB → cv2's exact fixed-point BT.601 gray, then the 8→16 upscale
        (cvtColor-before-*257 order of dataset.py decode_image)."""
        import cv2

        rs = np.random.RandomState(3)
        arr = rs.randint(0, 255, (8, 8, 3), np.uint8)  # RGB order on disk
        got = self._decode(tmp_path, arr)
        want = cv2.cvtColor(arr, cv2.COLOR_RGB2GRAY).astype(np.uint16) * 257
        assert np.array_equal(got, want)

    def test_rgb16_collapses_to_bt601_luminance(self, tmp_path):
        import cv2

        rs = np.random.RandomState(5)
        arr = rs.randint(0, 65535, (8, 8, 3), np.uint16)
        got = self._decode(tmp_path, arr, name="rgb16.tif")
        want = cv2.cvtColor(arr, cv2.COLOR_RGB2GRAY)
        assert np.array_equal(got, want)

    def test_compressed_falls_back_to_python(self, tmp_path):
        if load_native() is None:
            pytest.skip("no native toolchain")
        f = tmp_path / "z.tif"
        self._write_tiff(f, np.zeros((8, 8), np.uint16), compression=5)
        assert decode_batch_native([f]) is None

    def test_matches_python_decode_chain(self, tmp_path):
        if load_native() is None:
            pytest.skip("no native toolchain")
        rs = np.random.RandomState(4)
        arr = rs.randint(0, 65535, (32, 32), np.uint16)
        f = tmp_path / "chain.tif"
        self._write_tiff(f, arr)
        native = decode_batch_native([f])
        py = decode_image(f)  # cv2 reads classic TIFFs
        assert np.array_equal(native[0, ..., 0], py)
