"""RuuviTag BLE RAWv2 decoder — OP-S8, the reference's ESP32 gateway
(esp32/ruuvitag_gateway/main/main.c:305-368) as a Spark operator.

The gateway scans BLE advertisements for Ruuvi's manufacturer-specific
AD structure (0xFF, manufacturer id 0x0499 little-endian, data format
0x05) and unpacks the RAWv2 fields (public Ruuvi data-format-5 spec):
temperature s16 x 0.005 degC, humidity u16 x 0.0025 %, pressure
u16 + 50000 Pa, acceleration 3 x s16 x 0.001 g, a packed power word
(battery millivolts in the top 11 bits + 1600, tx power in the low 5
bits x 2 - 40 dBm), movement counter u8, measurement sequence u16.

Here the same decode runs as pure column expressions over a BINARY
advertisement column — hex + dynamic substr + conv are all
whole-stage-codegen, so decoding 100 TB of raw BLE captures is one
narrow scan with NO Python and no per-row UDF. The marker search
mirrors the C byte loop as a filter over a bounded offset sequence
(BLE legacy advertisements are <= 31 bytes), byte-aligned by
construction. Output is the wide RAW_RUUVITAG_SCHEMA row shape, so
decoded frames feed the exact same normalize/fan-out chain (OP-T1..)
as the JSON source — the decoder is just another front door.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# FF (manufacturer-specific AD type) + 0x0499 little-endian + format 5
_MARKER = "FF990405"


def _marker_offset(hexs: Column, adv: Column) -> Column:
    """Byte offset of the RuuviTag marker (the C loop's `i`), NULL when
    absent or the frame is too short to hold a full RAWv2 payload."""
    # marker byte i .. sequence ends at byte i+20 -> need length >= i+21
    max_off = F.length(adv) - F.lit(21)
    offs = F.when(
        max_off >= 0, F.sequence(F.lit(0), max_off.cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    hits = F.filter(
        offs, lambda i: hexs.substr(i * 2 + 1, F.lit(8)) == F.lit(_MARKER)
    )
    return F.try_element_at(hits, F.lit(1))  # NULL on no match (ANSI-safe)


def decode_ruuvitag_rawv2(
    frames: DataFrame,
    adv_col: str = "adv_data",
    mac_col: str = "mac",
    ts_col: str = "timestamp",
) -> DataFrame:
    """(mac, adv_data binary, timestamp) -> wide RuuviTag reading rows
    (RAW_RUUVITAG_SCHEMA shape; timestamp kept as the epoch-seconds
    string the normalize chain parses). Frames without the marker (or
    shorter than the C gateway's 25-byte minimum) are dropped, exactly
    like process_ruuvi_data's early returns.

    Documented divergence: the C loop scans markers up to
    adv_len - 7 (main.c:311) but reads payload bytes through i+20
    without a further bound, so a marker found in the last 14 bytes of
    a frame makes the reference read PAST the buffer — undefined
    behavior returning garbage readings. This decoder requires the
    full 21-byte payload to fit (_marker_offset's len-21 bound) and
    DROPS such frames instead: strictly safer, and the only frames
    treated differently are ones whose reference output is memory
    noise."""
    adv = F.col(adv_col)
    hexs = F.hex(adv)  # uppercase hex, 2 chars per byte
    i = _marker_offset(hexs, adv)

    def u8(off: int) -> Column:
        return F.conv(hexs.substr((i + off) * 2 + 1, F.lit(2)), 16, 10).cast("long")

    def u16(off: int) -> Column:
        return F.conv(hexs.substr((i + off) * 2 + 1, F.lit(4)), 16, 10).cast("long")

    def s16(off: int) -> Column:
        u = u16(off)
        return F.when(u >= 32768, u - 65536).otherwise(u)

    mac = F.col(mac_col)
    # accept either a pre-formatted string MAC or 6 raw bytes (the
    # gateway's snprintf formatting, as column expressions)
    mac_fmt = F.when(
        mac.cast("string").rlike("^([0-9a-fA-F]{2}:){5}[0-9a-fA-F]{2}$"),
        F.lower(mac.cast("string")),
    ).otherwise(
        F.lower(
            F.concat_ws(
                ":",
                *[F.hex(F.substring(mac.cast("binary"), j + 1, 1)) for j in range(6)],
            )
        )
    )
    power = u16(16)
    decoded = frames.select(
        mac_fmt.alias("device_id"),
        F.lit("ruuvitag").alias("device_type"),
        F.col(ts_col).cast("string").alias("timestamp"),
        (s16(4).cast("double") * 0.005).alias("temperature"),
        (u16(6).cast("double") * 0.0025).alias("humidity"),
        (u16(8).cast("double") + 50000.0).alias("pressure"),
        (s16(10).cast("double") * 0.001).alias("acceleration_x"),
        (s16(12).cast("double") * 0.001).alias("acceleration_y"),
        (s16(14).cast("double") * 0.001).alias("acceleration_z"),
        ((F.shiftright(power, 5).cast("double") + 1600.0) * 0.001).alias(
            "battery_voltage"
        ),
        (power.bitwiseAND(F.lit(31)).cast("double") * 2.0 - 40.0).alias("tx_power"),
        u8(18).cast("double").alias("movement_counter"),
        u16(19).cast("double").alias("measurement_sequence"),
        i.alias("_marker_off"),
        F.length(adv).alias("_adv_len"),
    )
    return (
        decoded.where(F.col("_marker_off").isNotNull() & (F.col("_adv_len") >= 25))
        .drop("_marker_off", "_adv_len")
    )
