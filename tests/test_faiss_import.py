"""FAISS flat-index parser tests (synthesized files in the documented
serialization layout; faiss itself is not installed in this image)."""

import struct

import numpy as np
import pytest

from ragroute_tpu.index.faiss_import import read_flat_index


def write_flat(path, vecs, fourcc=b"IxFI", metric_type=0, trained=1,
               nbytes=None):
    n, d = vecs.shape
    data = vecs.astype(np.float32).tobytes()
    with open(path, "wb") as f:
        f.write(fourcc)
        f.write(struct.pack("<i", d))
        f.write(struct.pack("<q", n))
        f.write(struct.pack("<qq", 1 << 20, 1 << 20))  # deprecated dummies
        f.write(struct.pack("<b", trained))
        f.write(struct.pack("<i", metric_type))
        f.write(struct.pack("<Q", nbytes if nbytes is not None else len(data)))
        f.write(data)


def test_parse_ip_index(tmp_path, rng):
    vecs = rng.standard_normal((50, 8)).astype(np.float32)
    p = str(tmp_path / "a.faiss")
    write_flat(p, vecs, b"IxFI", 0)
    got, metric = read_flat_index(p)
    np.testing.assert_array_equal(got, vecs)
    assert metric == "ip"


def test_parse_l2_index(tmp_path, rng):
    vecs = rng.standard_normal((10, 4)).astype(np.float32)
    p = str(tmp_path / "b.faiss")
    write_flat(p, vecs, b"IxF2", 1)
    got, metric = read_flat_index(p)
    np.testing.assert_array_equal(got, vecs)
    assert metric == "l2"


def test_rejects_non_flat(tmp_path):
    p = str(tmp_path / "ivf.faiss")
    with open(p, "wb") as f:
        f.write(b"IwIF" + b"\0" * 64)
    with pytest.raises(ValueError, match="not a FAISS flat index"):
        read_flat_index(p)


def test_rejects_layout_mismatch(tmp_path, rng):
    vecs = rng.standard_normal((5, 4)).astype(np.float32)
    p = str(tmp_path / "bad.faiss")
    write_flat(p, vecs, b"IxFI", 0, nbytes=999)
    with pytest.raises(ValueError, match="layout mismatch"):
        read_flat_index(p)
