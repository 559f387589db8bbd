"""Z-order (Morton) clustering keys — multi-dimensional data layout
for file/row-group skipping (Iceberg's ``rewrite_data_files`` with a
z-order sort; the same curve Delta's OPTIMIZE ZORDER BY walks).

Why it matters at 100 TB: min/max-statistics pruning only skips a file
when the filtered column is CLUSTERED — a table sorted by x answers
x-predicates by touching few files but y-predicates by touching all of
them.  Interleaving the bits of k quantized columns gives every column
locality ~2^(bits/k): a box predicate on ANY subset of the z-ordered
columns maps to a bounded set of curve ranges, so the same layout
serves all of them.  The key is pure 64-bit integer arithmetic
(quantize → shift/mask interleave), stays inside whole-stage codegen,
and is bit-identical across engines (``zorder_key_sql`` emits the
DuckDB image used by the oracle gate).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _check(n_cols: int, bits: int) -> None:
    if n_cols < 1:
        raise ValueError("zorder_key needs at least one column")
    if bits < 1 or n_cols * bits > 62:
        raise ValueError(
            f"n_cols*bits must fit a positive int64: {n_cols}*{bits}"
        )


def quantize(col: Column, lo: int, hi: int, bits: int) -> Column:
    """Exact integer rank of ``col`` in [lo, hi] scaled to [0, 2^bits):
    ((x - lo) · (2^bits - 1)) DIV (hi - lo), clamped.  Integer DIV keeps
    the cell boundary bit-stable across engines."""
    if hi <= lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    top = (1 << bits) - 1
    if (hi - lo) * top >= 1 << 53:
        # beyond 2^53 the double quotient below can straddle the floor
        # boundary; quantize wider ranges in two stages instead
        raise ValueError(
            f"(hi-lo)*(2^bits-1) must stay below 2^53: [{lo},{hi}] @{bits}b"
        )
    c = F.least(F.greatest(col.cast("long"), F.lit(lo)), F.lit(hi))
    # (c-lo)*top < 2^53, so the double division is exact enough that
    # floor() lands on the true integer quotient (same value as DIV///)
    return F.floor((c - F.lit(lo)) * F.lit(top) / F.lit(hi - lo)).cast(
        "long"
    )


def zorder_key(qcols: list[Column], bits: int) -> Column:
    """Morton key of pre-quantized columns (each in [0, 2^bits)): bit b
    of column i lands at interleaved position b·k + i.  k·bits ≤ 62."""
    _check(len(qcols), bits)
    k = len(qcols)
    key = F.lit(0).cast("long")
    for i, q in enumerate(qcols):
        qc = q.cast("long")
        for b in range(bits):
            key = key + F.shiftleft(
                F.shiftright(qc, b).bitwiseAND(F.lit(1)), b * k + i
            )
    return key


def zorder_key_sql(qcol_sql: list[str], bits: int) -> str:
    """DuckDB image of ``zorder_key`` for the oracle gate: the same
    shift/mask interleave over the given quantized-column SQL
    expressions."""
    _check(len(qcol_sql), bits)
    k = len(qcol_sql)
    # every term fully parenthesized: '+' binds tighter than '<<' in
    # SQL, so a bare 'x << p + y << q' would chain the shifts
    terms = [
        f"(((({q}) >> {b}) & 1) << {b * k + i})"
        for i, q in enumerate(qcol_sql)
        for b in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def quantize_sql(expr: str, lo: int, hi: int, bits: int) -> str:
    """DuckDB image of ``quantize`` (integer // division)."""
    if hi <= lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    top = (1 << bits) - 1
    clamped = f"least(greatest(CAST({expr} AS BIGINT), {lo}), {hi})"
    return f"((({clamped} - {lo}) * {top}) // {hi - lo})"
