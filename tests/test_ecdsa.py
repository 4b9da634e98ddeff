"""ECDSA P-256 (core/ecdsa.py) — pinned against the PUBLISHED RFC 6979
A.2.5 vectors (a genuine independent cross-validation: key generation,
deterministic nonce, r/s), plus the CMS integration arm of the signed
family (ecdsa-with-SHA256/-SHA1 SignerInfos verified from the embedded
EC certificate)."""

from __future__ import annotations

import hashlib

from pdfparser_spark.core import ecdsa as E

D = 0xC9AFA9D845BA75166B5C215767B1D6934E50C3DB36E89B127B8A622B120F6721


def test_rfc6979_published_vectors():
    qx, qy = E.public_key(D)
    assert qx == 0x60FED4BA255A9D31C961EB74C6356D68C049B8923B61FA6CE669622E60F29FB6
    assert qy == 0x7903FE1008B8BC99A41AE9E95628BC64F2F1B20C2D7E9F5177A3C294D4462299
    h = hashlib.sha256(b"sample").digest()
    assert E.rfc6979_nonce(D, h) == (
        0xA6E3C57DD01ABE90086538398355DD4C3B17AA873382B0F24D6129493D8AAD60
    )
    r, s = E.sign(D, h)
    assert r == 0xEFD48B2AACB6A8FD1140DD9CD45E81D69D2C877B56AAF991C34D0EA84EAF3716
    assert s == 0xF7CB1C942D657C41D436C7A1B6E29F65F3E900DBB9AFF4064DC4AB2F843ACDA8
    assert E.verify(qx, qy, h, r, s)


def test_verify_rejects_mutations():
    qx, qy = E.public_key(D)
    h = hashlib.sha256(b"msg").digest()
    r, s = E.sign(D, h)
    assert E.verify(qx, qy, h, r, s)
    assert not E.verify(qx, qy, h, r ^ 1, s)
    assert not E.verify(qx, qy, h, r, s ^ 1)
    assert not E.verify(qx, qy, hashlib.sha256(b"other").digest(), r, s)
    assert not E.verify(qx, qy + 1, h, r, s)  # off-curve point
    assert not E.verify(qx, qy, h, 0, s)
    assert not E.verify(qx, qy, h, r, E.N)


def test_der_roundtrip_and_malformed():
    r, s = E.sign(D, hashlib.sha256(b"x").digest())
    assert E.sig_from_der(E.sig_to_der(r, s)) == (r, s)
    assert E.sig_from_der(b"\x30\x02\x05\x00") is None
    assert E.sig_from_der(b"") is None
    # small r/s keep minimal DER
    assert E.sig_from_der(E.sig_to_der(1, 2)) == (1, 2)


def test_sha1_digest_sizes_handled():
    # ecdsa-with-SHA1: 160-bit digest, no truncation branch
    h = hashlib.sha1(b"legacy").digest()
    qx, qy = E.public_key(D)
    r, s = E.sign(D, h)
    assert E.verify(qx, qy, h, r, s)


def test_signed_family_ecdsa_arms():
    """The %7==2 signed docs carry EC certificates + (r,s) signatures;
    the full §12.8 walk verifies them and flags the tampered/appended/
    corrupt variants exactly like the RSA arms."""
    from pdfparser_spark.core.extract import extract_signatures
    from pdfparser_spark.synth import (
        build_document_signed,
        expected_signature,
        sig_is_ecdsa,
    )

    text = "alpha beta gamma delta epsilon zeta"
    # doc ids covering (ecdsa x each %5 variant): 30, 16, 2, 23, 9
    docs = [30, 16, 2, 23, 9]
    assert all(sig_is_ecdsa(d) for d in docs)
    assert sorted(d % 5 for d in docs) == [0, 1, 2, 3, 4]
    for doc_id in docs:
        d = build_document_signed(doc_id, text)
        res = extract_signatures(d["bytes"])
        assert len(res["signatures"]) == 1, (doc_id, res["errors"])
        got = res["signatures"][0]
        assert got[0] == 0 and tuple(got[1:]) == expected_signature(doc_id), doc_id
        assert got[4] == "ec"
