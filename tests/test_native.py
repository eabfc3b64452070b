"""Native C++ .ts parser: parity with the pure-python path."""

import numpy as np
import pytest

from feature_level_style_transfer_for_tsc_tpu.data.native import native_available
from feature_level_style_transfer_for_tsc_tpu.data.synthetic import make_arrays, write_ts_file
from feature_level_style_transfer_for_tsc_tpu.data.ts_parser import (
    _load_from_tsfile_py,
    load_from_tsfile,
)

needs_native = pytest.mark.skipif(not native_available(), reason="no g++ toolchain")


@needs_native
def test_native_matches_python(tmp_path):
    x, y = make_arrays(20, 3, 40, 4, seed=0)
    path = str(tmp_path / "P" / "P_TRAIN.ts")
    write_ts_file(path, x, y)
    xn, yn = load_from_tsfile(path)
    xp, yp = _load_from_tsfile_py(path)
    np.testing.assert_allclose(xn, xp, atol=1e-6)
    assert list(yn) == list(yp)


@needs_native
def test_native_missing_values(tmp_path):
    p = tmp_path / "Q_TRAIN.ts"
    p.write_text(
        "@problemName q\n@classLabel true a b\n@data\n1.0,?,3.0:a\n?,2.0,4.0:b\n"
    )
    x, y = load_from_tsfile(str(p))
    assert x.shape == (2, 1, 3)
    assert np.isnan(x[0, 0, 1]) and np.isnan(x[1, 0, 0])
    assert list(y) == ["a", "b"]


@needs_native
def test_native_multivariate_unequal(tmp_path):
    p = tmp_path / "U_TRAIN.ts"
    p.write_text(
        "@problemName u\n@dimensions 2\n@classLabel true x y\n@data\n"
        "1,2,3:4,5:x\n6,7:8,9,10:y\n"
    )
    x, y = load_from_tsfile(str(p))
    assert x.shape == (2, 2, 3)
    assert np.isnan(x[0, 1, 2])  # padded tail
    assert x[1, 1, 2] == 10
