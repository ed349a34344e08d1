"""Avro message-payload codec pins (r14, VERDICT r13 #1).

The load-bearing test is JVM byte-parity: Spark's own AvroSerializer
(via the bundled AvroFileFormat, uncompressed OCF) writes records whose
raw bytes must equal RecordCodec's output exactly — against the avro
schema SPARK generated into the container header, so union order and
field naming are Spark's, not ours. Plus spec vectors, malformed-input
behavior, framing algebra, and the native-expression probe contract.
"""

from __future__ import annotations

from collections import Counter

import pytest

from ibd_pipeline_spark.sources import avro_codec as A

SCHEMA = (
    '{"type":"record","name":"msg","fields":['
    '{"name":"event_id","type":"long"},'
    '{"name":"event_type","type":"string"},'
    '{"name":"value","type":["null","double"]},'
    '{"name":"ts_us","type":"long"}]}'
)


# ---------------------------------------------------------------------------
# Pure-Python spec pins (no Spark)
# ---------------------------------------------------------------------------


def test_zigzag_spec_vectors():
    # Table straight from the Avro spec
    for v, z in ((0, 0), (-1, 1), (1, 2), (-2, 3), (2, 4), (-64, 127), (64, 128)):
        assert A.zigzag_encode(v) == z
        assert A.zigzag_decode(z) == v


def test_varint_spec_vectors():
    cases = {0: "00", 1: "01", 127: "7f", 128: "8001", 16383: "ff7f", 16384: "808001"}
    for z, hexs in cases.items():
        out = bytearray()
        A.write_varint(z, out)
        assert bytes(out).hex() == hexs, z
        back, pos = A.read_varint(bytes(out), 0)
        assert (back, pos) == (z, len(out))
        assert A.varint_len(z) == len(out)


def test_record_spec_vector():
    # long 1 | string "foo" | union-null | long 0
    c = A.RecordCodec(SCHEMA)
    assert c.encode([1, "foo", None, 0]).hex() == "0206666f6f0000"
    # union non-null branch: index 1 encodes as long 1 = 0x02
    b = c.encode([0, "", 1.0, 0])
    assert b.hex() == "000002000000000000f03f00"


def test_roundtrip_edge_values():
    c = A.RecordCodec(SCHEMA)
    for row in (
        [-(2**63), "", None, 2**63 - 1],
        [42, "héllo wörld 購入", -0.0, -1],
        [0, "x" * 1000, 1e-308, 0],
    ):
        vals, pos = c.decode(c.encode(row))
        assert vals == row and pos == len(c.encode(row))


def test_decode_malformations():
    c = A.RecordCodec(SCHEMA)
    good = c.encode([7, "view", 2.5, 99])
    with pytest.raises(ValueError):
        c.decode(good[:-1])  # truncated
    with pytest.raises(ValueError):
        c.decode(good + b"\x00")  # trailing byte
    with pytest.raises(ValueError):
        c.decode(b"")  # empty
    with pytest.raises(ValueError):
        c.decode(b"\xff" * 11)  # overlong varint
    # bad union index (2) after event_id+event_type
    pre = bytearray()
    A.write_long(7, pre)
    A.write_long(4, pre)
    pre += b"view"
    A.write_long(2, pre)  # union index 2: invalid
    with pytest.raises(ValueError):
        c.decode(bytes(pre) + b"\x00")


def test_schema_subset_rejections():
    for bad in (
        '{"type":"enum","name":"e","symbols":["A"]}',
        '{"type":"record","name":"r","fields":[{"name":"a","type":"fixed"}]}',
        '{"type":"record","name":"r","fields":'
        '[{"name":"a","type":["null","string","long"]}]}',
        '{"type":"record","name":"r","fields":'
        '[{"name":"a","type":{"type":"array","items":"long"}}]}',
    ):
        with pytest.raises(ValueError):
            A.RecordCodec(bad)


# ---------------------------------------------------------------------------
# JVM byte-parity via the bundled AvroFileFormat (uncompressed OCF)
# ---------------------------------------------------------------------------


def test_jvm_byte_parity_via_ocf(spark, tmp_path):
    """Spark's JVM AvroSerializer and RecordCodec must produce
    IDENTICAL bytes per record — the codec is built from the avro
    schema Spark itself wrote into the container header, so this also
    pins our handling of Spark's union order and naming."""
    from ibd_pipeline_spark.sources.io import avro_available, write_avro

    if not avro_available(spark):
        pytest.skip("no Avro datasource on this classpath")

    rows = [
        (1, "view", 2.5, 1_700_000_000_000_000),
        (2, "click", None, 1_700_000_000_000_001),
        (-64, "購入 with unicode", -0.0, 3),
        (2**62, "", 1e-300, -(2**62)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, value double, ts_us long"
    ).coalesce(1)
    out = str(tmp_path / "ocf")
    write_avro(df, out, compression="uncompressed")

    import glob

    (part,) = glob.glob(f"{out}/part-*.avro")
    schema_json, records = A.split_ocf_records(part)
    codec = A.RecordCodec(schema_json)

    ours = Counter(codec.encode(list(r)) for r in rows)
    theirs = Counter(records)
    assert ours == theirs, "byte-level divergence from JVM AvroSerializer"
    # and decode Spark's bytes back to the original values
    decoded = Counter(tuple(codec.decode(b)[0]) for b in records)
    assert decoded == Counter(tuple(r) for r in rows)


def test_jvm_byte_parity_logical_types_via_ocf(spark, tmp_path):
    """Logical types (r15, VERDICT r14 #3): Spark's JVM writer maps
    DecimalType → fixed+decimal, DateType → int+date, TimestampType →
    long+timestamp-micros; RecordCodec built from Spark's own
    container schema must reproduce those bytes EXACTLY and decode
    them back value-for-value — the first-message shapes a
    Debezium/CDC consumer hits."""
    import datetime as dt
    from decimal import Decimal

    from ibd_pipeline_spark.sources.io import avro_available, write_avro

    if not avro_available(spark):
        pytest.skip("no Avro datasource on this classpath")

    rows = [
        (1, Decimal("123.45"), dt.date(2024, 3, 1),
         dt.datetime(2024, 3, 1, 12, 30, 15, 123456)),
        (2, Decimal("-0.01"), dt.date(1969, 12, 31),  # negative day
         dt.datetime(1969, 12, 31, 23, 59, 59, 999999)),  # negative us
        (3, Decimal("9999999999.99"), dt.date(1970, 1, 1),
         dt.datetime(1970, 1, 1)),
        (4, None, dt.date(2262, 4, 11),
         dt.datetime(2100, 1, 1, 0, 0, 0, 1)),
    ]
    df = spark.createDataFrame(
        rows, "k long, price decimal(12,2), d date, ts timestamp"
    ).coalesce(1)
    out = str(tmp_path / "ocf_logical")
    write_avro(df, out, compression="uncompressed")

    import glob

    (part,) = glob.glob(f"{out}/part-*.avro")
    schema_json, records = A.split_ocf_records(part)
    assert '"logicalType":"decimal"' in schema_json.replace(" ", "")
    codec = A.RecordCodec(schema_json)

    ours = Counter(codec.encode(list(r)) for r in rows)
    theirs = Counter(records)
    assert ours == theirs, "byte-level divergence on logical types"
    decoded = Counter(tuple(codec.decode(b)[0]) for b in records)
    assert decoded == Counter(tuple(r) for r in rows)


def test_decimal_bytes_form_roundtrip_and_minimality():
    """The BYTES-decimal form (Debezium's): minimal two's-complement
    big-endian unscaled — boundary widths 127/128/-128/-129 and the
    zero byte."""
    from decimal import Decimal

    s = (
        '{"type":"record","name":"r","fields":[{"name":"v","type":'
        '{"type":"bytes","logicalType":"decimal","precision":20,'
        '"scale":2}}]}'
    )
    codec = A.RecordCodec(s)
    for unscaled, width in [
        (0, 1), (1, 1), (127, 1), (128, 2), (255, 2), (32767, 2),
        (32768, 3), (-1, 1), (-128, 1), (-129, 2), (-32768, 2),
        (-32769, 3), (10**18, 8),
    ]:
        v = Decimal(unscaled).scaleb(-2)
        enc = codec.encode([v])
        # zigzag(len) varint is 1 byte for these widths
        assert enc[0] == width * 2, (unscaled, enc.hex())
        assert len(enc) == 1 + width
        got, _ = codec.decode(enc)
        assert got[0] == v


def test_logical_type_schema_rejections():
    for bad in [
        '{"type":"record","name":"r","fields":[{"name":"v","type":'
        '{"type":"bytes","logicalType":"decimal","precision":0,'
        '"scale":0}}]}',  # precision 0
        '{"type":"record","name":"r","fields":[{"name":"v","type":'
        '{"type":"bytes","logicalType":"decimal","precision":5,'
        '"scale":9}}]}',  # scale > precision
        '{"type":"record","name":"r","fields":[{"name":"v","type":'
        '{"type":"fixed","name":"f","size":0,"logicalType":"decimal",'
        '"precision":5,"scale":2}}]}',  # size 0
        '{"type":"record","name":"r","fields":[{"name":"v","type":'
        '{"type":"string","logicalType":"uuid-ish"}}]}',  # unknown lt
        '{"type":"record","name":"r","fields":[{"name":"v","type":'
        '{"type":"long","logicalType":"date"}}]}',  # date must be int
    ]:
        with pytest.raises(ValueError):
            A.RecordCodec(bad)
    # spec: an unrecognized annotation on a primitive falls back to
    # the underlying type
    ok = A.RecordCodec(
        '{"type":"record","name":"r","fields":[{"name":"v","type":'
        '{"type":"string"}}]}'
    )
    assert ok.fields[0].prim == "string"


# ---------------------------------------------------------------------------
# Column-level API on Spark
# ---------------------------------------------------------------------------


def test_column_roundtrip_and_wire(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(1, "view", 2.5, 10), (2, "click", None, 11)],
        "event_id long, event_type string, value double, ts_us long",
    )
    enc = df.select(
        "event_id",
        A.to_avro_binary(
            F.struct("event_id", "event_type", "value", "ts_us"),
            SCHEMA,
            spark,
            use_native="fallback",
        ).alias("p"),
    )
    wire = enc.select(
        "event_id", A.to_confluent_wire(F.col("p"), 1234).alias("w")
    )
    back = wire.select(
        "event_id",
        A.wire_schema_id(F.col("w")).alias("sid"),
        A.from_avro_binary(
            A.wire_payload(F.col("w"), 1234),
            SCHEMA,
            spark,
            mode="FAILFAST",
            use_native="fallback",
        ).alias("r"),
    ).select("event_id", "sid", "r.*")
    got = {tuple(r) for r in back.collect()}
    assert got == {
        (1, 1234, 1, "view", 2.5, 10),
        (2, 1234, 2, "click", None, 11),
    }


def test_wire_rejects_bad_frames(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(b"\x00\x00\x00\x04\xd2\x02",), (b"\x01junk",), (b"\x00\x00",)],
        "w binary",
    )
    got = df.select(
        A.wire_schema_id(F.col("w")).alias("sid"),
        A.wire_payload(F.col("w")).alias("p"),
        A.wire_payload(F.col("w"), 9999).alias("p_wrong_id"),
    ).collect()
    assert [r.sid for r in got] == [1234, None, None]
    assert [r.p for r in got] == [b"\x02", None, None]
    assert [r.p_wrong_id for r in got] == [None, None, None]


def test_permissive_vs_failfast(spark):
    import pyspark.sql.functions as F

    c = A.RecordCodec(SCHEMA)
    good = c.encode([5, "view", None, 1])
    df = spark.createDataFrame([(good,), (good[:-1],), (None,)], "p binary")
    perm = df.select(
        A.from_avro_binary(
            F.col("p"), SCHEMA, spark, mode="PERMISSIVE", use_native="fallback"
        ).alias("r")
    ).select("r.*")
    rows = perm.collect()
    assert tuple(rows[0]) == (5, "view", None, 1)
    assert tuple(rows[1]) == (None, None, None, None)
    assert tuple(rows[2]) == (None, None, None, None)

    strict = df.select(
        A.from_avro_binary(
            F.col("p"), SCHEMA, spark, mode="FAILFAST", use_native="fallback"
        ).alias("r")
    )
    with pytest.raises(Exception, match="malformed Avro payload"):
        strict.collect()


def test_native_probe_contract(spark):
    """The probe must agree with what actually happens when the
    native expressions are invoked — self-flipping gate, no marker."""
    avail = A.avro_expressions_available(spark)
    import pyspark.sql.functions as F

    df = spark.range(1).select(F.struct(F.col("id")).alias("s"))
    try:
        from pyspark.sql.avro.functions import to_avro

        df.select(to_avro(F.col("s"))).collect()
        ran = True
    except Exception:
        ran = False
    assert ran == avail


def test_file_pair_logical_types_roundtrip(spark, tmp_path):
    """The FILE pair (read_avro/write_avro, JVM datasource) must
    round-trip DecimalType/DateType/TimestampType values exactly —
    the file-level half of the r15 logical-types story (the payload
    half is io_avro_logical_roundtrip)."""
    import datetime as dt
    from decimal import Decimal

    from ibd_pipeline_spark.sources.io import (
        avro_available,
        read_avro,
        write_avro,
    )

    if not avro_available(spark):
        pytest.skip("no Avro datasource on this classpath")

    rows = [
        (1, Decimal("0.01"), dt.date(2024, 2, 29),
         dt.datetime(2024, 2, 29, 23, 59, 59, 999999)),
        (2, Decimal("-9999999999.99"), dt.date(1969, 7, 20), None),
        (3, None, dt.date(1970, 1, 1), dt.datetime(1970, 1, 1)),
    ]
    df = spark.createDataFrame(
        rows, "k long, price decimal(12,2), d date, ts timestamp"
    )
    out = str(tmp_path / "logical_pair")
    write_avro(df, out)
    back = read_avro(spark, out)
    assert back.schema == df.schema
    assert sorted(tuple(r) for r in back.collect()) == sorted(rows)
