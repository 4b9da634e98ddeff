"""Digital-signature verification (ISO 32000 §12.8) — the math, not the
trust chain.

A signed PDF carries a signature dictionary whose ``/ByteRange`` names the
exact file bytes covered and whose ``/Contents`` holds a DER-encoded CMS
(PKCS#7, RFC 5652) ``SignedData``.  This module implements, from the
public RFCs only (5652 CMS, 8017 PKCS#1 v1.5, 5280 X.509):

  - a minimal DER reader (definite-length TLV walk),
  - the CMS walk: SignedData -> certificates[0] -> SubjectPublicKeyInfo
    (the RSA modulus/exponent come from the EMBEDDED certificate — no
    out-of-band key), signerInfos[0] -> signedAttrs / messageDigest /
    signature, plus the subject CN for reporting,
  - RSASSA-PKCS1-v1_5 verification: ``sig^e mod n`` unpadded to a
    DigestInfo and compared against the hash of the DER-retagged
    signedAttrs (RFC 5652 §5.4: the [0] IMPLICIT tag is replaced by an
    explicit SET OF for the signature computation),
  - the §12.8.2 coverage check: the two byte ranges must start at 0 and
    end at EOF, leaving only the /Contents hex hole uncovered.

Certificate-chain and revocation checking are out of scope (documented):
at corpus scale the useful signal is "is the signature internally valid
and does it cover the whole file", which is exactly what tampering
breaks.  The reference has no signature tier (its walk stops at
/Contents, doc_tree.rs:63-142).

Pure Python (hashlib + bigint pow), deterministic, ValueError-contained.
"""

from __future__ import annotations

import hashlib

OID_SIGNED_DATA = "1.2.840.113549.1.7.2"
OID_MESSAGE_DIGEST = "1.2.840.113549.1.9.4"
OID_RSA = "1.2.840.113549.1.1.1"
OID_CN = "2.5.4.3"
OID_SHA256 = "2.16.840.1.101.3.4.2.1"
OID_SHA1 = "1.3.14.3.2.26"
OID_EC_PUBKEY = "1.2.840.10045.2.1"
OID_P256 = "1.2.840.10045.3.1.7"
OID_ECDSA_SHA256 = "1.2.840.10045.4.3.2"

_HASHERS = {OID_SHA256: hashlib.sha256, OID_SHA1: hashlib.sha1}

# DigestInfo prefixes (RFC 8017 §9.2 note 1)
_DIGEST_INFO_PREFIX = {
    OID_SHA256: bytes.fromhex("3031300d060960864801650304020105000420"),
    OID_SHA1: bytes.fromhex("3021300906052b0e03021a05000414"),
}


def _tlv(data: bytes, pos: int):
    """One DER TLV: returns (tag, content_start, content_end, next_pos).
    Definite lengths only (DER); raises ValueError on malformed input."""
    n = len(data)
    if pos + 2 > n:
        raise ValueError("DER: truncated header")
    tag = data[pos]
    if tag & 0x1F == 0x1F:
        raise ValueError("DER: multi-byte tags unsupported")
    l0 = data[pos + 1]
    pos += 2
    if l0 < 0x80:
        length = l0
    else:
        nb = l0 & 0x7F
        if nb == 0 or nb > 4 or pos + nb > n:
            raise ValueError("DER: bad length")
        length = int.from_bytes(data[pos : pos + nb], "big")
        pos += nb
    if pos + length > n:
        raise ValueError("DER: content overruns buffer")
    return tag, pos, pos + length, pos + length


def _children(data: bytes, start: int, end: int):
    """TLVs of a constructed node's content, in order."""
    out = []
    pos = start
    while pos < end:
        tag, cs, ce, pos = _tlv(data, pos)
        out.append((tag, cs, ce))
    return out


def _decode_oid(data: bytes, start: int, end: int) -> str:
    body = data[start:end]
    if not body:
        raise ValueError("DER: empty OID")
    out = [str(body[0] // 40), str(body[0] % 40)]
    v = 0
    for b in body[1:]:
        v = (v << 7) | (b & 0x7F)
        if not b & 0x80:
            out.append(str(v))
            v = 0
    return ".".join(out)


def _int_at(data: bytes, node) -> int:
    tag, cs, ce = node
    if tag != 0x02:
        raise ValueError("DER: expected INTEGER")
    return int.from_bytes(data[cs:ce], "big")


def _alg_oid(data: bytes, node) -> str:
    tag, cs, ce = node
    if tag != 0x30:
        raise ValueError("DER: expected AlgorithmIdentifier")
    kids = _children(data, cs, ce)
    if not kids or kids[0][0] != 0x06:
        raise ValueError("DER: AlgorithmIdentifier without OID")
    return _decode_oid(data, kids[0][1], kids[0][2])


def _spki_key(data: bytes, spki) -> dict:
    """SubjectPublicKeyInfo -> key descriptor: ``{"kind": "rsa", n, e}``
    for rsaEncryption, ``{"kind": "ec", x, y}`` for id-ecPublicKey on
    P-256 (the uncompressed 04||X||Y point form)."""
    kids = _children(data, spki[1], spki[2])
    if len(kids) != 2 or kids[1][0] != 0x03:
        raise ValueError("DER: SubjectPublicKeyInfo shape")
    alg = _alg_oid(data, kids[0])
    bs, be = kids[1][1], kids[1][2]
    if be <= bs or data[bs] != 0:
        raise ValueError("DER: BIT STRING with unused bits")
    if alg == OID_EC_PUBKEY:
        alg_kids = _children(data, kids[0][1], kids[0][2])
        if len(alg_kids) != 2 or alg_kids[1][0] != 0x06:
            raise ValueError("DER: ecPublicKey without namedCurve")
        if _decode_oid(data, alg_kids[1][1], alg_kids[1][2]) != OID_P256:
            raise ValueError("DER: unsupported EC curve")
        pt = data[bs + 1 : be]
        if len(pt) != 65 or pt[0] != 0x04:
            raise ValueError("DER: EC point not uncompressed")
        return {
            "kind": "ec",
            "x": int.from_bytes(pt[1:33], "big"),
            "y": int.from_bytes(pt[33:65], "big"),
        }
    if alg != OID_RSA:
        raise ValueError("DER: unsupported SPKI algorithm")
    tag, cs, ce, _ = _tlv(data, bs + 1)
    if tag != 0x30:
        raise ValueError("DER: RSAPublicKey not a SEQUENCE")
    ints = _children(data, cs, ce)
    if len(ints) != 2:
        raise ValueError("DER: RSAPublicKey arity")
    return {"kind": "rsa", "n": _int_at(data, ints[0]), "e": _int_at(data, ints[1])}


def _subject_cn(data: bytes, name_node) -> str | None:
    """First CN (2.5.4.3) in an X.501 Name (SEQ of SET of SEQ{OID, str})."""
    for rdn in _children(data, name_node[1], name_node[2]):
        for atv in _children(data, rdn[1], rdn[2]):
            kids = _children(data, atv[1], atv[2])
            if len(kids) == 2 and kids[0][0] == 0x06:
                if _decode_oid(data, kids[0][1], kids[0][2]) == OID_CN:
                    return data[kids[1][1] : kids[1][2]].decode("latin-1")
    return None


def _cert_key_and_cn(data: bytes, cert) -> tuple[dict, str | None]:
    """Certificate -> (key descriptor, subject CN).  tbsCertificate
    fields per RFC 5280 §4.1: [0] version?, serial, signature, issuer,
    validity, subject, subjectPublicKeyInfo."""
    tbs = _children(data, cert[1], cert[2])[0]
    kids = _children(data, tbs[1], tbs[2])
    i = 1 if kids and kids[0][0] == 0xA0 else 0
    serial, _sigalg, _issuer, _validity, subject, spki = kids[i : i + 6]
    if serial[0] != 0x02:
        raise ValueError("DER: tbsCertificate shape")
    return _spki_key(data, spki), _subject_cn(data, subject)


def _rsa_verify(sig: bytes, n: int, e: int, digest_oid: str, message: bytes) -> bool:
    """RSASSA-PKCS1-v1_5 (RFC 8017 §8.2.2) over ``message``."""
    prefix = _DIGEST_INFO_PREFIX.get(digest_oid)
    hasher = _HASHERS.get(digest_oid)
    if prefix is None or hasher is None:
        return False
    k = (n.bit_length() + 7) // 8
    if len(sig) != k:
        return False
    em = pow(int.from_bytes(sig, "big"), e, n).to_bytes(k, "big")
    t = prefix + hasher(message).digest()
    if len(t) + 11 > k:
        return False
    expected = b"\x00\x01" + b"\xff" * (k - len(t) - 3) + b"\x00" + t
    return em == expected


def verify_cms(cms: bytes, signed_bytes: bytes) -> dict:
    """Verify a detached CMS SignedData over ``signed_bytes`` (the
    concatenated /ByteRange content).  Returns
    ``{signer, digest_alg, digest_ok, sig_ok}``; raises ValueError on
    structurally broken DER (the caller reports a metric row)."""
    top = _tlv(cms, 0)
    if top[0] != 0x30:
        raise ValueError("CMS: not a SEQUENCE")
    ci = _children(cms, top[1], top[2])
    if len(ci) != 2 or ci[0][0] != 0x06:
        raise ValueError("CMS: ContentInfo shape")
    if _decode_oid(cms, ci[0][1], ci[0][2]) != OID_SIGNED_DATA:
        raise ValueError("CMS: not signedData")
    sd_wrap = _children(cms, ci[1][1], ci[1][2])
    if not sd_wrap or sd_wrap[0][0] != 0x30:
        raise ValueError("CMS: SignedData shape")
    sd = _children(cms, sd_wrap[0][1], sd_wrap[0][2])
    # version, digestAlgorithms, encapContentInfo, [0] certs?, [1] crls?,
    # signerInfos
    key = None
    signer = None
    for node in sd[3:]:
        if node[0] == 0xA0:  # certificates
            certs = _children(cms, node[1], node[2])
            if certs:
                key, signer = _cert_key_and_cn(cms, certs[0])
    si_set = sd[-1]
    if si_set[0] != 0x31:
        raise ValueError("CMS: signerInfos missing")
    sis = _children(cms, si_set[1], si_set[2])
    if not sis:
        raise ValueError("CMS: no SignerInfo")
    si = _children(cms, sis[0][1], sis[0][2])
    # version, sid, digestAlgorithm, [0] signedAttrs, sigAlg, signature
    digest_oid = _alg_oid(cms, si[2])
    attrs_node = si[3]
    if attrs_node[0] != 0xA0:
        raise ValueError("CMS: signedAttrs missing (PDF requires them)")
    sig_node = si[5]
    if sig_node[0] != 0x04:
        raise ValueError("CMS: signature not an OCTET STRING")
    sig = cms[sig_node[1] : sig_node[2]]

    # messageDigest attribute vs the actual byte-range hash
    hasher = _HASHERS.get(digest_oid)
    msg_digest = None
    for attr in _children(cms, attrs_node[1], attrs_node[2]):
        kids = _children(cms, attr[1], attr[2])
        if len(kids) == 2 and kids[0][0] == 0x06:
            if _decode_oid(cms, kids[0][1], kids[0][2]) == OID_MESSAGE_DIGEST:
                vals = _children(cms, kids[1][1], kids[1][2])
                if vals and vals[0][0] == 0x04:
                    msg_digest = cms[vals[0][1] : vals[0][2]]
    digest_ok = (
        hasher is not None
        and msg_digest is not None
        and hasher(signed_bytes).digest() == msg_digest
    )

    # signature over the RETAGGED signedAttrs (RFC 5652 §5.4: explicit
    # SET OF replaces the [0] IMPLICIT tag), dispatched on the embedded
    # certificate's key kind: RSASSA-PKCS1-v1_5 or ECDSA P-256 (the DER
    # (r, s) SEQUENCE in SignerInfo.signature)
    sig_ok = False
    if key is not None:
        content = cms[attrs_node[1] : attrs_node[2]]
        retagged = _der_header(0x31, len(content)) + content
        if key["kind"] == "rsa":
            sig_ok = _rsa_verify(sig, key["n"], key["e"], digest_oid, retagged)
        else:
            from . import ecdsa as _ecdsa

            hasher = _HASHERS.get(digest_oid)
            rs = _ecdsa.sig_from_der(sig)
            if hasher is not None and rs is not None:
                sig_ok = _ecdsa.verify(
                    key["x"], key["y"], hasher(retagged).digest(), rs[0], rs[1]
                )
    return {
        "signer": signer,
        "digest_alg": "sha256" if digest_oid == OID_SHA256 else
                      "sha1" if digest_oid == OID_SHA1 else digest_oid,
        "key_alg": key["kind"] if key is not None else None,
        "digest_ok": bool(digest_ok),
        "sig_ok": bool(sig_ok),
    }


def _der_header(tag: int, length: int) -> bytes:
    if length < 0x80:
        return bytes((tag, length))
    lb = length.to_bytes((length.bit_length() + 7) // 8, "big")
    return bytes((tag, 0x80 | len(lb))) + lb


def byte_range_coverage_ok(byte_range, file_len: int) -> bool:
    """§12.8.2: the two ranges must start at 0, end at EOF, and be
    ordered with a single uncovered hole (the /Contents hex) between
    them.  A signature whose ranges leave file bytes uncovered signs
    less than the document — report, never trust."""
    if not (isinstance(byte_range, list) and len(byte_range) == 4):
        return False
    o1, l1, o2, l2 = byte_range
    if not all(isinstance(v, int) and v >= 0 for v in (o1, l1, o2, l2)):
        return False
    return o1 == 0 and o1 + l1 <= o2 and o2 + l2 == file_len


def range_bytes(data: bytes, byte_range) -> bytes:
    o1, l1, o2, l2 = byte_range
    return data[o1 : o1 + l1] + data[o2 : o2 + l2]


# ---------------------------------------------------------------------------
# SIGNING side (the writer tier's counterpart): detached CMS SignedData
# production with a minimal self-describing certificate.  Key material is
# caller-supplied — RSA (n, e, d) or an EC P-256 private scalar.

_OID_B = {
    "signedData": bytes.fromhex("06092a864886f70d010702"),
    "data": bytes.fromhex("06092a864886f70d010701"),
    "contentType": bytes.fromhex("06092a864886f70d010903"),
    "messageDigest": bytes.fromhex("06092a864886f70d010904"),
    "rsa": bytes.fromhex("06092a864886f70d010101"),
    "sha256": bytes.fromhex("0609608648016503040201"),
    "cn": bytes.fromhex("0603550403"),
    "ecPubKey": bytes.fromhex("06072a8648ce3d0201"),
    "p256": bytes.fromhex("06082a8648ce3d030107"),
    "ecdsaSha256": bytes.fromhex("06082a8648ce3d040302"),
}


def _emit(tag: int, content: bytes) -> bytes:
    n = len(content)
    if n < 0x80:
        return bytes([tag, n]) + content
    nb = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([tag, 0x80 | len(nb)]) + nb + content


def _emit_int(v: int) -> bytes:
    b = v.to_bytes((v.bit_length() + 7) // 8 or 1, "big")
    if b[0] & 0x80:
        b = b"\x00" + b
    return _emit(0x02, b)


def _emit_name(cn: str) -> bytes:
    atv = _emit(0x30, _OID_B["cn"] + _emit(0x13, cn.encode("ascii")))
    return _emit(0x30, _emit(0x31, atv))


def make_certificate(key: dict, cn: str, serial: int = 1) -> bytes:
    """Minimal RFC 5280 certificate carrying ``key`` ({"kind": "rsa",
    n, e} or {"kind": "ec", x, y}).  The certificate's own signature is
    a zero bit string — chain validation is out of scope here (module
    docstring); the verifier reads SPKI + subject CN only."""
    if key["kind"] == "rsa":
        spki = _emit(
            0x30,
            _emit(0x30, _OID_B["rsa"] + _emit(0x05, b""))
            + _emit(0x03, b"\x00" + _emit(0x30, _emit_int(key["n"]) + _emit_int(key["e"]))),
        )
        sig_alg = _emit(0x30, _OID_B["rsa"] + _emit(0x05, b""))
    else:
        point = b"\x04" + key["x"].to_bytes(32, "big") + key["y"].to_bytes(32, "big")
        spki = _emit(
            0x30,
            _emit(0x30, _OID_B["ecPubKey"] + _OID_B["p256"]) + _emit(0x03, b"\x00" + point),
        )
        sig_alg = _emit(0x30, _OID_B["ecdsaSha256"])
    validity = _emit(
        0x30, _emit(0x17, b"200101000000Z") + _emit(0x17, b"400101000000Z")
    )
    tbs = _emit(
        0x30,
        _emit(0xA0, _emit_int(2))
        + _emit_int(serial)
        + sig_alg
        + _emit_name("pdfspark signing CA")
        + validity
        + _emit_name(cn)
        + spki,
    )
    return _emit(0x30, tbs + sig_alg + _emit(0x03, b"\x00\x00"))


def make_signed_cms(
    signed_bytes: bytes,
    *,
    rsa: tuple | None = None,
    ec_d: int | None = None,
    cn: str = "pdfspark signer",
    serial: int = 1,
) -> bytes:
    """Detached CMS SignedData (RFC 5652 §5) over ``signed_bytes`` with
    SHA-256 signed attributes — RSASSA-PKCS1-v1_5 when ``rsa=(n, e, d)``,
    ECDSA P-256 (RFC 6979 deterministic) when ``ec_d`` is given."""
    if (rsa is None) == (ec_d is None):
        raise ValueError("exactly one of rsa / ec_d required")
    digest = hashlib.sha256(signed_bytes).digest()
    attrs = (
        _emit(0x30, _OID_B["contentType"] + _emit(0x31, _OID_B["data"]))
        + _emit(0x30, _OID_B["messageDigest"] + _emit(0x31, _emit(0x04, digest)))
    )
    to_sign = _emit(0x31, attrs)  # RFC 5652 §5.4 retag
    if rsa is not None:
        n, e, d = rsa
        key = {"kind": "rsa", "n": n, "e": e}
        k = (n.bit_length() + 7) // 8
        t = _DIGEST_INFO_PREFIX[OID_SHA256] + hashlib.sha256(to_sign).digest()
        em = b"\x00\x01" + b"\xff" * (k - len(t) - 3) + b"\x00" + t
        sig = pow(int.from_bytes(em, "big"), d, n).to_bytes(k, "big")
        sig_alg = _emit(0x30, _OID_B["rsa"] + _emit(0x05, b""))
    else:
        from . import ecdsa as _ecdsa

        qx, qy = _ecdsa.public_key(ec_d)
        key = {"kind": "ec", "x": qx, "y": qy}
        r, s = _ecdsa.sign(ec_d, hashlib.sha256(to_sign).digest())
        sig = _ecdsa.sig_to_der(r, s)
        sig_alg = _emit(0x30, _OID_B["ecdsaSha256"])
    alg_sha256 = _emit(0x30, _OID_B["sha256"] + _emit(0x05, b""))
    si = _emit(
        0x30,
        _emit_int(1)
        + _emit(0x30, _emit_name("pdfspark signing CA") + _emit_int(serial))
        + alg_sha256
        + _emit(0xA0, attrs)
        + sig_alg
        + _emit(0x04, sig),
    )
    sd = _emit(
        0x30,
        _emit_int(1)
        + _emit(0x31, alg_sha256)
        + _emit(0x30, _OID_B["data"])
        + _emit(0xA0, make_certificate(key, cn, serial))
        + _emit(0x31, si),
    )
    return _emit(0x30, _OID_B["signedData"] + _emit(0xA0, sd))
