"""Length-quantization parity (the single most score-critical detail)."""

import numpy as np
import pytest

from tests.conftest import HAVE_REFERENCE
from whoosh_novo_ray.lengths import (
    LENGTH_TABLE,
    byte_to_length,
    bytes_to_lengths,
    length_to_byte,
    lengths_to_bytes,
)


def test_boundaries():
    assert length_to_byte(None) == 0
    assert length_to_byte(0) == 0
    assert length_to_byte(106374) == 255
    assert length_to_byte(10**7) == 255
    assert byte_to_length(0) == 0
    assert byte_to_length(255) == 106374
    assert len(LENGTH_TABLE) == 256


def test_vectorized_matches_scalar():
    lens = np.array([0, 1, 5, 11, 27, 100, 1000, 106373, 106374, 10**7])
    vb = lengths_to_bytes(lens)
    assert vb.tolist() == [length_to_byte(int(x)) for x in lens]
    assert bytes_to_lengths(vb).tolist() == [byte_to_length(int(b)) for b in vb]


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference repo not available")
def test_differential_vs_reference():
    from whoosh.util.numeric import byte_to_length as ref_b2l
    from whoosh.util.numeric import length_to_byte as ref_l2b

    for length in list(range(0, 2000)) + [10**4, 10**5, 106373, 106374, 10**6]:
        assert length_to_byte(length) == ref_l2b(length), length
    for b in range(256):
        assert byte_to_length(b) == ref_b2l(b), b
