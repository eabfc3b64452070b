"""Builder-math parity tests (reference OS_CNN_Structure_build.py, OS_CNN.py)."""

import numpy as np

from feature_level_style_transfer_for_tsc_tpu.models import structure as S


def _reference_primes(start, end):
    """Direct transcription of the reference's naive test for golden values."""
    out = []
    for val in range(start, end + 1):
        prime = True
        for n in range(2, val):
            if val % n == 0:
                prime = False
                break
        if prime:
            out.append(val)
    return out


def test_primes_include_one_and_two():
    # The quirk that defines the omni-scale kernel set.
    assert S.primes_in_range(1, 10) == [1, 2, 3, 5, 7]
    assert S.primes_in_range(1, 89) == _reference_primes(1, 89)
    assert 1 in S.primes_in_range(1, 2)


def test_layer_parameter_list_golden():
    # GunPoint-like: univariate, T=150 -> receptive field 37
    rf = S.receptive_field(150)
    assert rf == 37
    budgets = S.default_parameter_budgets(1)
    assert budgets == [8 * 128, 5 * 128 * 256 + 2 * 256 * 128]
    lpl = S.generate_layer_parameter_list(1, rf, budgets, 1)
    primes = S.primes_in_range(1, rf)
    assert len(lpl) == 3
    # layer 0: one branch per prime, in=1
    s = sum(primes)
    out0 = int(budgets[0] / (1 * s))
    assert lpl[0] == [(1, out0, p) for p in primes]
    in1 = len(primes) * out0
    out1 = int(budgets[1] / (in1 * s))
    assert lpl[1] == [(in1, out1, p) for p in primes]
    # final layer: kernel sizes start, start+1, width = len(primes)*out0
    in2 = len(primes) * out1
    assert lpl[2] == [(in2, len(primes) * out0, 1), (in2, len(primes) * out0, 2)]


def test_input_change():
    lpl = S.generate_layer_parameter_list(1, 12, [1024, 2048], 3)
    new = S.layer_parameter_list_input_change(lpl, 77)
    assert all(spec[0] == 77 for spec in new[0])
    assert new[1:] == lpl[1:]
    # widths/kernels unchanged
    assert [(o, k) for (_, o, k) in new[0]] == [(o, k) for (_, o, k) in lpl[0]]


def test_mask_bounds_match_reference_math():
    import math

    def ref(k, K):
        right = math.ceil((K - 1) / 2) - math.ceil((k - 1) / 2)
        left = K - k - right
        return left, left + k

    for K in (2, 3, 5, 37, 89):
        for k in range(1, K + 1):
            assert S.mask_bounds(k, K) == ref(k, K)


def test_layer_shapes_padding():
    # layer-1 budget must cover in_channel(=140)*sum_primes(=18); 1024 would
    # starve out_channels to 0, which the builder now rejects up front
    lpl = S.generate_layer_parameter_list(1, 10, [512, 4096], 1)
    sh = S.layer_shapes(lpl[0])
    K = lpl[0][-1][-1]
    assert sh.pad_left == (K - 1) // 2 and sh.pad_right == K // 2
    assert sh.out_channels == S.total_out_channels(lpl[0])


def test_os_mask_bands():
    from feature_level_style_transfer_for_tsc_tpu.ops.osconv import build_os_mask

    spec = [(3, 4, 1), (3, 4, 2), (3, 4, 3), (3, 4, 5)]
    mask = build_os_mask(spec)
    assert mask.shape == (5, 1, 16)
    # each branch's band has exactly k ones along taps
    for b, (_, out, k) in enumerate(spec):
        band = mask[:, 0, b * 4 : (b + 1) * 4]
        assert np.all(band.sum(axis=0) == k)


def test_builder_rejects_starved_budget():
    """budget_multiplier can starve out_channels to 0; the builder should
    raise a clear ValueError, not the downstream ZeroDivisionError."""
    import pytest

    from feature_level_style_transfer_for_tsc_tpu.structure import (
        generate_layer_parameter_list,
    )

    with pytest.raises(ValueError, match="too small"):
        generate_layer_parameter_list(1, 37, [50, 50], 1)
