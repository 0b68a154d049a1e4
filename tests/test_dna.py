import numpy as np
import pytest

from matchtigs_tpu.utils import dna


def test_encode_decode_roundtrip():
    seq = b"ACGTACGTTTGGCCA"
    codes = dna.encode_ascii(seq)
    assert dna.decode_to_ascii(codes) == seq


def test_encode_rejects_invalid():
    with pytest.raises(ValueError):
        dna.encode_ascii(b"ACGN")


def test_revcomp():
    codes = dna.encode_ascii(b"AACGT")
    assert dna.decode_to_ascii(dna.revcomp(codes)) == b"ACGTT"


def test_pack_kmers_matches_scalar():
    codes = dna.encode_ascii(b"ACGTACGTA")
    k = 4
    packed = dna.pack_kmers_u64(codes, k)
    for i in range(len(codes) - k + 1):
        assert int(packed[i]) == dna.pack_u64(codes[i : i + k])


def test_revcomp_packed():
    codes = dna.encode_ascii(b"ACGTTGCAAC")
    k = 5
    packed = dna.pack_kmers_u64(codes, k)
    rc = dna.revcomp_packed_u64(packed, k)
    for i in range(len(packed)):
        expected = dna.pack_u64(dna.revcomp(codes[i : i + k]))
        assert int(rc[i]) == expected


def test_canonical_packed():
    codes = dna.encode_ascii(b"ACGTTGCAAC")
    k = 5
    packed = dna.pack_kmers_u64(codes, k)
    canon = dna.canonical_packed_u64(packed, k)
    rc = dna.revcomp_packed_u64(packed, k)
    assert np.all(canon == np.minimum(packed, rc))
    # canonical is orientation-invariant
    rc_canon = dna.canonical_packed_u64(rc, k)
    assert np.all(canon == rc_canon)
