"""Shared mergeable-sketch primitives (HyperLogLog, Flajolet et al.
AofA 2007).

The property that matters at 100 TB is MERGEABILITY: an HLL register
set is a per-(group, register) MAX — commutative, associative,
idempotent — so partial sketches from any partitioning (map-side
combines, shuffle retries, streaming micro-batches, cross-day unions)
merge without bias or double-counting. These helpers are the single
source of truth for both the batch registry query
(`hll_distinct_sketch`, exact-oracle-matched against DuckDB) and the
Structured Streaming register maintenance (streaming/sketches.py,
stream==batch asserted).

Determinism: the hash is a 52-bit md5 prefix (exact in double), rho is
derived via INTEGER bit-length (`length(bin(w))`), never float log2 —
so the estimate itself, not just its error bound, is byte-identical
across engines, runs, and batch/streaming execution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

HLL_M = 64          # registers (p = 6); RSE = 1.04 / sqrt(64) = 13%
HLL_P = 6
HLL_ALPHA = 0.709   # alpha_64 (Flajolet et al., fig. 3)


def hll_reg_rho(key: Column, salt: str = "hll:") -> tuple[Column, Column]:
    """(register, rho) columns for one key: register = low p bits of a
    52-bit md5 hash, rho = leading zeros of the remaining 46 bits + 1
    (exact integer arithmetic — 47 - bit_length(w); 47 when w == 0)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 13),
        16, 10,
    ).cast("bigint")
    w = F.shiftright(h, HLL_P)
    rho = F.when(w == 0, F.lit(47)).otherwise(F.lit(47) - F.length(F.bin(w)))
    return (h % HLL_M).alias("reg"), rho.alias("rho")


def hll_estimate_from_registers(
    regs: DataFrame, group_cols: list[str], mx_col: str = "mx"
) -> DataFrame:
    """Fold materialized registers (<= HLL_M rows per group) into the
    estimate: raw = alpha * m^2 / (sum 2^-mx + empty), linear-counting
    correction m*ln(m/empty) when raw <= 2.5m and empties exist. Empty
    registers are counted ARITHMETICALLY (m - n_regs) — no register-grid
    join anywhere."""
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col(mx_col))).alias("s_present"),
        F.count(F.lit(1)).alias("n_regs"),
    )
    zeros = F.lit(HLL_M) - F.col("n_regs")
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) / (
        F.col("s_present") + zeros.cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        F.round(est, 4).alias("hll_estimate"),
        zeros.cast("int").alias("empty_registers"),
    )


CMS_D = 4    # hash rows
CMS_W = 256  # buckets per row


def cms_bucket(key: Column, row: int, w: int = CMS_W) -> Column:
    """Portable count-min bucket: row-salted md5 -> 32-bit prefix mod w
    (the same expression the batch heavy-hitters query and its DuckDB
    oracle compute — byte-identical across engines)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"cms{row}:"), key.cast("string"))), 1, 8
        ),
        16, 10,
    ).cast("bigint") % w
