"""Kafka security helpers (S2): JKS→PEM conversion and SASL JAAS config.

Mirrors the reference's security surface:

- ``jks_to_pem`` ≙ util/common.go:168-213 (JksToPem) — same output naming
  (``<jks>.cert.pem`` / ``<jks>.key.pem`` beside the keystore, skip when
  both already exist unless ``overwrite``), but pure Python instead of
  shelling out to keytool+openssl: the JKS container format and Sun's
  key-protector PBE are both public (the format is documented by multiple
  independent open-source readers, e.g. the pyjks project and OpenJDK's
  own ``JavaKeyStore``/``KeyProtector`` sources).
- ``build_jaas_config`` / ``parse_jaas_config`` ≙ config/config.go:540-567
  (readConfig over ``sasl.jaas.config``) — the PLAIN/SCRAM/GSSAPI
  branching the reference applies, emitted in the form Spark's Kafka
  source consumes (``kafka.sasl.jaas.config``).
- ``kafka_security_options`` ≙ config/config.go:525-567 — normalize a
  reference-style ``kafka.security`` map into Spark ``kafka.*`` options,
  converting JKS stores to PEM on the way so PEM-based clients (and the
  reference's franz-go path) see identical material.

JKS container layout (big-endian): magic 0xFEEDFEED, version 2, entry
count, then per entry a tag (1 = private key + chain, 2 = trusted cert),
UTF alias, timestamp, payload; the file ends with
SHA1(UTF-16BE(password) + b"Mighty Aphrodite" + preceding bytes).
Private keys are EncryptedPrivateKeyInfo DER using Sun's keystream PBE
(OID 1.3.6.1.4.1.42.2.17.1.1): data = salt[20] + ciphertext + check[20],
keystream chunks are SHA1(password + previous chunk), plaintext XOR, and
check = SHA1(password + plaintext).
"""

from __future__ import annotations

import base64
import hashlib
import os
import re
import struct

__all__ = [
    "JksError",
    "load_jks",
    "jks_to_pem",
    "build_jaas_config",
    "parse_jaas_config",
    "kafka_security_options",
]

_MAGIC = 0xFEEDFEED
_WHITENER = b"Mighty Aphrodite"
_SUN_PBE_OID = "1.3.6.1.4.1.42.2.17.1.1"


class JksError(ValueError):
    """Malformed keystore, wrong password, or unsupported entry."""


# ---------------------------------------------------------------------------
# minimal DER TLV reading (enough for EncryptedPrivateKeyInfo)
# ---------------------------------------------------------------------------


def _der_read(data: bytes, pos: int) -> tuple[int, bytes, int]:
    """Read one TLV at ``pos`` → (tag, value, next_pos)."""
    tag = data[pos]
    length = data[pos + 1]
    pos += 2
    if length & 0x80:
        n = length & 0x7F
        length = int.from_bytes(data[pos : pos + n], "big")
        pos += n
    return tag, data[pos : pos + length], pos + length


def _der_oid(value: bytes) -> str:
    out = [str(value[0] // 40), str(value[0] % 40)]
    acc = 0
    for b in value[1:]:
        acc = (acc << 7) | (b & 0x7F)
        if not b & 0x80:
            out.append(str(acc))
            acc = 0
    return ".".join(out)


# ---------------------------------------------------------------------------
# JKS parsing
# ---------------------------------------------------------------------------


def _passwd_bytes(password: str) -> bytes:
    return password.encode("utf-16-be")


def _decrypt_sun_pbe(epki: bytes, password: str) -> bytes:
    """Decrypt an EncryptedPrivateKeyInfo protected with Sun's JKS PBE."""
    _, seq, _ = _der_read(epki, 0)
    # seq = AlgorithmIdentifier SEQUENCE, OCTET STRING
    tag, alg, nxt = _der_read(seq, 0)
    if tag != 0x30:
        raise JksError("bad EncryptedPrivateKeyInfo structure")
    otag, oid_val, _ = _der_read(alg, 0)
    if otag != 0x06 or _der_oid(oid_val) != _SUN_PBE_OID:
        raise JksError(
            f"unsupported key protection algorithm (expected {_SUN_PBE_OID})"
        )
    dtag, data, _ = _der_read(seq, nxt)
    if dtag != 0x04 or len(data) < 40:
        raise JksError("bad encrypted key payload")
    salt, ciphertext, check = data[:20], data[20:-20], data[-20:]
    pw = _passwd_bytes(password)
    keystream = b""
    cur = salt
    while len(keystream) < len(ciphertext):
        cur = hashlib.sha1(pw + cur).digest()
        keystream += cur
    plain = bytes(c ^ k for c, k in zip(ciphertext, keystream))
    if hashlib.sha1(pw + plain).digest() != check:
        raise JksError("private key integrity check failed (wrong password?)")
    return plain  # PKCS#8 PrivateKeyInfo DER


def load_jks(path: str, password: str) -> dict[str, dict]:
    """Parse a JKS keystore → {alias: entry}.

    Entry: ``{"type": "trusted_cert", "cert": DER}`` or
    ``{"type": "private_key", "key": PKCS8-DER, "chain": [DER, ...]}``.
    Verifies the store-level SHA1 MAC (wrong store password raises).
    """
    with open(path, "rb") as f:
        blob = f.read()
    if len(blob) < 32 or struct.unpack(">I", blob[:4])[0] != _MAGIC:
        raise JksError(f"{path}: not a JKS keystore")
    version, count = struct.unpack(">II", blob[4:12])
    if version != 2:
        raise JksError(f"{path}: unsupported JKS version {version}")
    digest = hashlib.sha1(_passwd_bytes(password) + _WHITENER + blob[:-20]).digest()
    if digest != blob[-20:]:
        raise JksError(f"{path}: keystore integrity check failed (wrong password?)")

    pos = 12
    entries: dict[str, dict] = {}

    def u2() -> int:
        nonlocal pos
        (v,) = struct.unpack(">H", blob[pos : pos + 2])
        pos += 2
        return v

    def u4() -> int:
        nonlocal pos
        (v,) = struct.unpack(">I", blob[pos : pos + 4])
        pos += 4
        return v

    def utf() -> str:
        nonlocal pos
        n = u2()
        s = blob[pos : pos + n].decode("utf-8")
        pos += n
        return s

    def raw(n: int) -> bytes:
        nonlocal pos
        b = blob[pos : pos + n]
        pos += n
        return b

    for _ in range(count):
        tag = u4()
        alias = utf()
        pos += 8  # creation timestamp
        if tag == 1:
            key = raw(u4())
            chain = []
            for _ in range(u4()):
                utf()  # cert type, always "X.509"
                chain.append(raw(u4()))
            entries[alias] = {"type": "private_key", "key": key, "chain": chain}
        elif tag == 2:
            utf()  # cert type
            entries[alias] = {"type": "trusted_cert", "cert": raw(u4())}
        else:
            raise JksError(f"{path}: unknown entry tag {tag}")
    return entries


def _pem(kind: str, der: bytes) -> str:
    body = base64.encodebytes(der).decode().replace("\n", "")
    lines = [body[i : i + 64] for i in range(0, len(body), 64)]
    return f"-----BEGIN {kind}-----\n" + "\n".join(lines) + f"\n-----END {kind}-----\n"


def jks_to_pem(
    jks_path: str, jks_password: str, overwrite: bool = False
) -> tuple[str, str]:
    """JKS → (<jks>.cert.pem, <jks>.key.pem) beside the keystore —
    same contract as util/common.go:168-213: existing outputs are reused
    unless ``overwrite``; trusted certs and private-key chains all land in
    the cert PEM; decrypted PKCS#8 keys (if any) land in the key PEM
    (empty file for a truststore, as openssl -nocerts would produce)."""
    cert_pem_path = jks_path + ".cert.pem"
    key_pem_path = jks_path + ".key.pem"
    if not overwrite and os.path.exists(cert_pem_path) and os.path.exists(key_pem_path):
        return cert_pem_path, key_pem_path
    entries = load_jks(jks_path, jks_password)
    certs: list[str] = []
    keys: list[str] = []
    for entry in entries.values():
        if entry["type"] == "trusted_cert":
            certs.append(_pem("CERTIFICATE", entry["cert"]))
        else:
            keys.append(_pem("PRIVATE KEY", _decrypt_sun_pbe(entry["key"], jks_password)))
            certs.extend(_pem("CERTIFICATE", c) for c in entry["chain"])
    with open(cert_pem_path, "w") as f:
        f.write("".join(certs))
    with open(key_pem_path, "w") as f:
        f.write("".join(keys))
    return cert_pem_path, key_pem_path


# ---------------------------------------------------------------------------
# SASL / JAAS
# ---------------------------------------------------------------------------

_JAAS_KV = re.compile(r'([A-Za-z][\w.]*)\s*=\s*(?:"([^"]*)"|(\S+?))(?=[\s;]|$)')


def parse_jaas_config(config: str) -> dict[str, str]:
    """``sasl.jaas.config`` string → {key: value} (≙ readConfig,
    config/config.go:543)."""
    return {m.group(1): m.group(2) if m.group(2) is not None else m.group(3)
            for m in _JAAS_KV.finditer(config)}


def build_jaas_config(
    mechanism: str,
    username: str | None = None,
    password: str | None = None,
    keytab: str | None = None,
    principal: str | None = None,
) -> str:
    """The JAAS line Spark's Kafka source consumes, with the reference's
    mechanism branching (config/config.go:545-567): PLAIN and SCRAM-* use
    the matching LoginModule with username/password; GSSAPI uses
    Krb5LoginModule with either a keytab+principal or username/password.
    """
    mech = mechanism.upper()
    if mech == "PLAIN":
        module = "org.apache.kafka.common.security.plain.PlainLoginModule"
    elif mech.startswith("SCRAM-SHA-"):
        module = "org.apache.kafka.common.security.scram.ScramLoginModule"
    elif mech == "GSSAPI":
        if keytab:
            parts = [
                "com.sun.security.auth.module.Krb5LoginModule required",
                "useKeyTab=true storeKey=true",
                f'keyTab="{keytab}"',
            ]
            if principal:
                parts.append(f'principal="{principal}"')
            return " ".join(parts) + ";"
        return (
            "com.sun.security.auth.module.Krb5LoginModule required "
            f'useTicketCache=false username="{username or ""}" '
            f'password="{password or ""}";'
        )
    else:
        raise ValueError(f"kafka SASL mechanism {mechanism} is unsupported")
    return f'{module} required username="{username or ""}" password="{password or ""}";'


def kafka_security_options(security: dict[str, str]) -> dict[str, str]:
    """Reference-style ``kafka.security`` map → Spark ``kafka.*`` options
    (≙ convertKfkSecurity, config/config.go:525-567).

    SSL: truststore/keystore JKS paths convert to PEM via ``jks_to_pem``
    and surface as ssl.ca.location / ssl.certificate.location /
    ssl.key.location alongside the original store options (Spark's Java
    client consumes the JKS directly; PEM is for interop parity).
    SASL: a missing ``sasl.jaas.config`` is synthesized from
    username/password keys; GSSAPI keeps the service name.
    """
    out = {}
    protocol = security.get("security.protocol", "")
    for k, v in security.items():
        out[f"kafka.{k}"] = v
    if "SSL" in protocol:
        ts = security.get("ssl.truststore.location")
        if ts:
            ca, _ = jks_to_pem(ts, security.get("ssl.truststore.password", ""))
            out["kafka.ssl.ca.location"] = ca
        ks = security.get("ssl.keystore.location")
        if ks:
            cert, key = jks_to_pem(ks, security.get("ssl.keystore.password", ""))
            out["kafka.ssl.certificate.location"] = cert
            out["kafka.ssl.key.location"] = key
    if "SASL" in protocol and "sasl.jaas.config" not in security:
        mech = security.get("sasl.mechanism", "PLAIN")
        out["kafka.sasl.jaas.config"] = build_jaas_config(
            mech,
            username=security.get("sasl.username"),
            password=security.get("sasl.password"),
            keytab=security.get("sasl.kerberos.keytab"),
            principal=security.get("sasl.kerberos.principal"),
        )
    return out
