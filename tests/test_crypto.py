"""encrypt/decrypt (+_ip) and mime_q/charset — reference test vectors.

Vectors ported from reference src/stdlib/encrypt.rs:344+ (test_function
blocks), encrypt_ip.rs / decrypt_ip.rs examples, decode_mime_q.rs
examples, and encode/decode_charset.rs examples.
"""

from __future__ import annotations

import base64

import pytest
from pyspark.sql import functions as F

from vrl_spark.functions import codec, crypto

PT = "morethan1blockofdata"
K32 = b"32_bytes_" + b"x" * 23
K24 = b"24_bytes_" + b"x" * 15
K16 = b"16_bytes_" + b"x" * 7
K64 = b"64_bytes_" + b"x" * 55
IV16 = b"16_bytes_" + b"x" * 7
IV12 = b"12_bytes_" + b"x" * 3

ENCRYPT_VECTORS = [
    ("AES-256-CFB", K32, IV16, b"\xd13\x92\x81\x9a^\x0e=<\x88\xdc\xe7/:]\x90\x08S\x84q"),
    ("AES-192-CFB", K24, IV16, b"U\xbd6\xdbZ\xbfa}&8\xebog\x19\x99xE\xffL\xf1"),
    ("AES-128-CFB", K16, IV16, b"\xfd\xf9\xef\x1f@e\xef\xd0Z\xc3\x0c'\xad]\x0e\xd2\x0bZK4"),
    ("AES-256-OFB", K32, IV16, b"\xd13\x92\x81\x9a^\x0e=<\x88\xdc\xe7/:]\x90\xfe(\x89k"),
    ("AES-128-OFB", K16, IV16, b"\xfd\xf9\xef\x1f@e\xef\xd0Z\xc3\x0c'\xad]\x0e\xd2Qi\xe9\xf4"),
    ("AES-256-CTR", K32, IV16, b"\xd13\x92\x81\x9a^\x0e=<\x88\xdc\xe7/:]\x90\x9a\x99\xa7\xb6"),
    ("AES-256-CTR-LE", K32, IV16, b"\xd13\x92\x81\x9a^\x0e=<\x88\xdc\xe7/:]\x90\x9a\x99\xa7\xb6"),
    ("AES-128-CTR-LE", K16, IV16, b"\xfd\xf9\xef\x1f@e\xef\xd0Z\xc3\x0c'\xad]\x0e\xd2v\x04\x05\xee"),
    ("AES-256-CTR-BE", K32, IV16, b"\xd13\x92\x81\x9a^\x0e=<\x88\xdc\xe7/:]\x90k\xea\x1c\t"),
    ("AES-256-CBC-PKCS7", K32, IV16,
     b"\x80-9O\x1c\xf1,R\x02\xa0\x0e\x17G\xd8B\xf4\xf9q\xf3\x0c\xcaK\x03h\xbc\xb2\xe8vU\x12\x10\xb3"),
    ("AES-128-CBC-PKCS7", K16, IV16,
     b"\x94R\xb5\xfeE\xd9)N1\xd3\xfe\xe66E\x05\x9ch\xae\xf6\x82\rD\xfdH\xd3T8n\xa7\xec\x98W"),
    ("AES-256-CBC-ANSIX923", K32, IV16,
     b"\x80-9O\x1c\xf1,R\x02\xa0\x0e\x17G\xd8B\xf4\xd9vj\x15\n&\x92\xea\xee\x03 \xeb\x9e\x8f\x97\x90"),
    ("AES-256-CBC-ISO7816", K32, IV16,
     b"\x80-9O\x1c\xf1,R\x02\xa0\x0e\x17G\xd8B\xf4\x84\x12\xeb\xe6i\xef\xbcN\xe85\\HnV\xb2\x92"),
    ("AES-256-CBC-ISO10126", K32, IV16,
     b"\x80-9O\x1c\xf1,R\x02\xa0\x0e\x17G\xd8B\xf4\xf9q\xf3\x0c\xcaK\x03h\xbc\xb2\xe8vU\x12\x10\xb3"),
    ("AES-128-SIV", K32, IV16,
     b"iMy\xb15\x16\x9dK\x97!\x9d1\x0fq\xe2\x9a\xb2\x15\xb2\xd2\xd0@\x19\xfa(\xffoZ\x17\xac\xe5U\xce\xd4\x81t"),
    ("AES-256-SIV", K64, IV16,
     b"[\x9b>c\x8c\xb9\xf8\xa4\xb9\xf8\x15\xb0\xf9g \xbf\x84{\x16\xfa\xef\xcd4',O/0\xf6\xcdx\x0b\"A\xb95"),
    ("CHACHA20-POLY1305", K32, IV12,
     b"\x14m\xe3\xc9\xbc!\xafu\xe31\xb9\x17\x8f\x9bOo0}n\xf4{$\x95\x0f\xa0\x820\xb7R\xe3.{\xd7?\x96\x10"),
]


def _one(spark, col):
    df = spark.createDataFrame([(PT,)], ["t"]).select(col.alias("v"))
    return df.collect()[0]["v"]


@pytest.mark.parametrize("alg,key,iv,want", ENCRYPT_VECTORS,
                         ids=[v[0] for v in ENCRYPT_VECTORS])
def test_encrypt_reference_vectors(spark, alg, key, iv, want):
    got = _one(spark, crypto.encrypt(F.col("t"), alg, key, iv))
    assert bytes(got) == want, alg


@pytest.mark.parametrize("alg,key,iv,want", ENCRYPT_VECTORS,
                         ids=[v[0] for v in ENCRYPT_VECTORS])
def test_decrypt_reference_vectors(spark, alg, key, iv, want):
    df = spark.createDataFrame([(bytearray(want),)], ["c"])
    got = df.select(crypto.decrypt(F.col("c"), alg, key, iv).alias("p")).collect()[0]["p"]
    assert bytes(got) == PT.encode(), alg


def test_decrypt_bad_tag_is_error_branch(spark):
    df = spark.createDataFrame([(bytearray(b"garbage-not-a-valid-ct!"),)], ["c"])
    got = df.select(
        crypto.decrypt(F.col("c"), "CHACHA20-POLY1305", K32, IV12).alias("p")
    ).collect()[0]["p"]
    assert got is None


def test_unknown_algorithm_fails_at_build():
    with pytest.raises(ValueError, match="Invalid algorithm"):
        crypto.encrypt(F.col("t"), "ROT13", K32, IV16)
    with pytest.raises(ValueError, match="Invalid key size"):
        crypto.encrypt(F.col("t"), "AES-256-CFB", K16, IV16)
    with pytest.raises(ValueError, match="Invalid iv size"):
        crypto.encrypt(F.col("t"), "XCHACHA20-POLY1305", K32, IV16)


# extended-nonce AEADs: byte-exact parity with the reference's own
# test vectors (encrypt.rs:508-517), through the FULL Spark path
XNONCE_VECTORS = [
    ("XCHACHA20-POLY1305",
     b"\x84\xd0S<\\\x88\x019a\xd3\xa17\xdf\xc0\xe0\xd3h\xbcn-"
     b"\x98\x85@\x19\x08\xc5ki\x18\x10\xdd!T#\x91\xcf"),
    ("XSALSA20-POLY1305",
     b"(\xc8\xb8\x88\x1d\xc0\xc0F\xa5\xc7n\xc8\x05B\t\xceiR\x8f\xaf"
     b"\xc7\xa8\xeb.\x95(\x14\xe8C\x80[w\x85\xf3\x8dn"),
]


@pytest.mark.parametrize("alg,want", XNONCE_VECTORS,
                         ids=[v[0] for v in XNONCE_VECTORS])
def test_extended_nonce_reference_vectors(spark, alg, want):
    key = b"32_bytes_" + b"x" * 23
    iv = b"24_bytes_" + b"x" * 15
    df = spark.createDataFrame([("morethan1blockofdata",)], ["t"])
    ct = df.select(crypto.encrypt(F.col("t"), alg, key, iv).alias("c"))
    got = ct.collect()[0]["c"]
    assert bytes(got) == want, alg
    back = ct.select(crypto.decrypt(F.col("c"), alg, key, iv).alias("p"))
    assert bytes(back.collect()[0]["p"]) == b"morethan1blockofdata"
    # tamper -> error branch (NULL), not an exception
    bad = spark.createDataFrame(
        [(bytearray(want[:-1] + bytes([want[-1] ^ 1])),)], ["c"]
    )
    assert bad.select(
        crypto.decrypt(F.col("c"), alg, key, iv).alias("p")
    ).collect()[0]["p"] is None


IP_VECTORS = [
    # (ip, key, mode, encrypted)  — encrypt_ip.rs / decrypt_ip.rs examples
    ("192.168.1.1", b"sixteen byte key", "aes128", "72b9:a747:f2e9:72af:76ca:5866:6dcf:c3b0"),
    ("2001:db8::1", b"sixteen byte key", "aes128", "c0e6:eb35:6887:f554:4c65:8ace:17ca:6c6a"),
    ("192.168.1.1", b"thirty-two bytes key for pfx use", "pfx", "33.245.248.61"),
    ("2001:db8::1", b"thirty-two bytes key for ipv6pfx", "pfx", "88bd:d2bf:8865:8c4d:84b:44f6:6077:72c9"),
]


@pytest.mark.parametrize("ip,key,mode,enc", IP_VECTORS,
                         ids=[f"{v[2]}-{v[0]}" for v in IP_VECTORS])
def test_encrypt_decrypt_ip_vectors(spark, ip, key, mode, enc):
    df = spark.createDataFrame([(ip, enc)], ["plain", "ct"])
    row = df.select(
        crypto.encrypt_ip(F.col("plain"), key, mode).alias("e"),
        crypto.decrypt_ip(F.col("ct"), key, mode).alias("d"),
    ).collect()[0]
    assert row["e"] == enc
    assert row["d"] == ip


def test_encrypt_ip_roundtrip_and_errors(spark):
    df = spark.createDataFrame([("192.168.1.100",), ("not-an-ip",)], ["ip"])
    rows = df.select(
        "ip",
        crypto.decrypt_ip(
            crypto.encrypt_ip(F.col("ip"), b"sixteen byte key", "aes128"),
            b"sixteen byte key", "aes128",
        ).alias("rt"),
    ).collect()
    got = {r["ip"]: r["rt"] for r in rows}
    assert got["192.168.1.100"] == "192.168.1.100"
    assert got["not-an-ip"] is None
    with pytest.raises(ValueError, match="Invalid mode"):
        crypto.encrypt_ip(F.col("ip"), b"sixteen byte key", "caesar")
    with pytest.raises(ValueError, match="16-byte key"):
        crypto.encrypt_ip(F.col("ip"), b"short", "aes128")


def test_pfx_preserves_prefixes(spark):
    """Same /24 in -> same encrypted /24 out (the pfx contract)."""
    key = b"thirty-two bytes key for pfx use"
    ips = ["10.1.2.3", "10.1.2.77", "10.1.3.3"]
    df = spark.createDataFrame([(i,) for i in ips], ["ip"])
    got = {r["ip"]: r["e"] for r in df.select(
        "ip", crypto.encrypt_ip(F.col("ip"), key, "pfx").alias("e")).collect()}
    p = {k: v.rsplit(".", 1)[0] for k, v in got.items()}
    assert p["10.1.2.3"] == p["10.1.2.77"]
    assert p["10.1.2.3"] != p["10.1.3.3"]


MIME_VECTORS = [
    ("=?utf-8?b?SGVsbG8sIFdvcmxkIQ==?=", "Hello, World!"),
    ("From: =?utf-8?b?SGVsbG8sIFdvcmxkIQ==?= <=?utf-8?q?hello=5Fworld=40example=2ecom?=>",
     "From: Hello, World! <hello_world@example.com>"),
    ("?b?SGVsbG8sIFdvcmxkIQ==", "Hello, World!"),
    ("no encoded words here", "no encoded words here"),
]


@pytest.mark.parametrize("src,want", MIME_VECTORS)
def test_decode_mime_q(spark, src, want):
    df = spark.createDataFrame([(src,)], ["t"])
    got = df.select(codec.decode_mime_q(F.col("t")).alias("v")).collect()[0]["v"]
    assert got == want


CHARSET_VECTORS = [
    ("euc-kr", "vsiz58fPvLy/5A==", "안녕하세요"),
    ("euc-jp", "pLOk86TLpMGkzw==", "こんにちは"),
    ("gb2312", "xOO6ww==", "你好"),
]


@pytest.mark.parametrize("cs,b64,text", CHARSET_VECTORS, ids=[v[0] for v in CHARSET_VECTORS])
def test_charset_roundtrip(spark, cs, b64, text):
    raw = bytearray(base64.b64decode(b64))
    df = spark.createDataFrame([(raw, text)], ["raw", "txt"])
    row = df.select(
        codec.decode_charset(F.col("raw"), cs).alias("d"),
        codec.encode_charset(F.col("txt"), cs).alias("e"),
    ).collect()[0]
    assert row["d"] == text
    assert base64.b64encode(bytes(row["e"])).decode() == b64
    with pytest.raises(LookupError):
        codec.decode_charset(F.col("raw"), "no-such-charset")
