"""Encrypted-credential support (C5 ≙ util/gosypt.go + util/aes.go).

The reference lets config files carry Jasypt-style wrapped secrets —
``password: ENC(<hex>)`` — decrypted at config-apply time
(task/sinker.go:345-349) with MySQL-compatible AES-128-ECB
(util/aes.go:12-51: ``aes_encrypt(plain, unhex(salt))`` semantics):

- key = the salt bytes zero-padded to 16, XOR-folding any overflow
  (util/aes.go:53-63 generateKey);
- encrypt: zero-copy the plaintext into whole blocks, pad bytes = pad
  length (PKCS7-ish), ECB each block, uppercase hex;
- decrypt: ECB-decrypt every block, trim at the first byte < 32
  (util/aes.go:64-72 searchByteSliceIndex — strips the pad run).

AES itself comes from the ``cryptography`` package (ECB is the mode the
reference uses; its weakness for long plaintexts is inherited behavior —
these are short passwords, and compatibility is the point).
"""

from __future__ import annotations

import dataclasses

__all__ = [
    "aes_encrypt_ecb",
    "aes_decrypt_ecb",
    "ensure_password",
    "unmarshal",
    "DEFAULT_SALT",
    "PREFIX",
    "SUFFIX",
]

DEFAULT_SALT = "656f6974656b"  # reference default (util/aes.go:9)
PREFIX = "ENC("
SUFFIX = ")"


def _generate_key(key: bytes) -> bytes:
    """≙ generateKey (util/aes.go:53-63): first 16 bytes, XOR-fold the rest."""
    gen = bytearray(16)
    gen[: min(16, len(key))] = key[:16]
    i = 16
    while i < len(key):
        for j in range(16):
            if i >= len(key):
                break
            gen[j] ^= key[i]
            i += 1
    return bytes(gen)


def _cipher(salt_hex: str):
    try:
        from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes
    except ImportError as e:  # pragma: no cover - baked into the container
        raise RuntimeError(
            "gosypt decryption needs the 'cryptography' package for AES-ECB"
        ) from e
    return Cipher(algorithms.AES(_generate_key(bytes.fromhex(salt_hex))), modes.ECB())


def aes_encrypt_ecb(plain: str, salt_hex: str = DEFAULT_SALT) -> str:
    """≙ AesEncryptECB: MySQL aes_encrypt-compatible, uppercase hex out."""
    if not plain:
        return plain
    o = plain.encode()
    nblocks = (len(o) + 16) // 16
    buf = bytearray(nblocks * 16)
    buf[: len(o)] = o
    pad = len(buf) - len(o)
    for i in range(len(o), len(buf)):
        buf[i] = pad
    enc = _cipher(salt_hex).encryptor()
    return (enc.update(bytes(buf)) + enc.finalize()).hex().upper()


def aes_decrypt_ecb(encrypted_hex: str, salt_hex: str = DEFAULT_SALT) -> str:
    """≙ AesDecryptECB: decrypt all blocks, trim at the first byte < 32."""
    if not encrypted_hex:
        return encrypted_hex
    dec = _cipher(salt_hex).decryptor()
    out = dec.update(bytes.fromhex(encrypted_hex)) + dec.finalize()
    end = len(out)
    for i, b in enumerate(out):
        if b < 32:
            end = i
            break
    return out[:end].decode(errors="replace")


def ensure_password(value: str, salt_hex: str = DEFAULT_SALT) -> str:
    """≙ Gosypt.ensurePassword: unwrap ``ENC(...)``; passthrough otherwise."""
    if not (isinstance(value, str) and value.startswith(PREFIX) and value.endswith(SUFFIX)):
        return value
    return aes_decrypt_ecb(value[len(PREFIX) : -len(SUFFIX)], salt_hex)


def unmarshal(obj, salt_hex: str = DEFAULT_SALT):
    """≙ Gosypt.Unmarshal: recursively decrypt every ``ENC(...)`` string in
    a dataclass / dict / list / tuple graph, in place where possible."""
    if isinstance(obj, str):
        return ensure_password(obj, salt_hex)
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        for f in dataclasses.fields(obj):
            setattr(obj, f.name, unmarshal(getattr(obj, f.name), salt_hex))
        return obj
    if isinstance(obj, dict):
        return {k: unmarshal(v, salt_hex) for k, v in obj.items()}
    if isinstance(obj, list):
        return [unmarshal(v, salt_hex) for v in obj]
    if isinstance(obj, tuple):
        return tuple(unmarshal(v, salt_hex) for v in obj)
    return obj
