"""Allocation-free exact decimal sums (optimization round 11).

The engine's cross-engine exactness discipline sums double measures
as DECIMAL (order-independent, hash-stable vs the DuckDB oracle).
Spark's ``cast(double AS decimal(p,s))`` goes through
``BigDecimal(java.lang.Double.toString(v))`` — one string allocation
plus a parse per row — and the wide-decimal sum buffer adds a
``BigDecimal`` add per row. Measured at sf0.1 (guide §1.1): a 5-sum
lineitem aggregate spends 1.76 s in that path vs 0.20 s for plain
long sums, and the cost does NOT parallelize (32 tasks inflated the
stage's CPU time 2.5 s → 17.5 s on one local JVM: the path is
allocation/GC-bound, guide §5).

This module computes the SAME decimal values with zero per-row
allocation:

1. ``scaled_long(e, s)`` — the half-up fixed-point scaling of a
   double at scale ``s`` as a plain LONG (value·10^s), built from
   exact double arithmetic: split ``|e|`` into integer part ``ip``
   (``floor``, exact) and fraction ``fr = |e| − ip`` (exact —
   subtracting the floor of a double < 2^53 is lossless), scale each
   part separately where the arithmetic cannot round
   (``ip·10^s`` in LONG, ``fr·10^s`` in double with |error| ≪ 0.5),
   and re-attach the sign. Every step is whole-stage-codegen long or
   double math.
2. ``dec_sum(e, s)`` — ``sum(scaled_long(e).cast(decimal(38,0)))``
   then one exact post-aggregate unscale multiply (``· 10^-s``,
   decimal×decimal on the handful of GROUP rows). The per-row
   long→decimal(38,0) cast is the compact-long constructor (no
   BigDecimal), and Spark's decimal add stays on its compact-long
   fast path until a partial sum outgrows 18 digits — after which it
   promotes to BigDecimal and keeps going, so the aggregate is
   overflow-safe at any corpus size (a plain BIGINT sum would ANSI-
   crash at ~10^12 rows of 10^6-scaled prices; guide §2.3 "narrower
   types — only when provably safe" is exactly this caveat).

Equivalence contract — same VALUES as ``cast(e AS decimal(p,s))``
summed:

- Magnitude: exact for any |e| (above 2^52 doubles are integers, the
  fraction path degenerates to 0); the LONG scaling overflows only
  past |e|·10^s > 2^63−1, where ANSI mode raises loudly instead of
  corrupting (callers here sum 6dp measures bounded ≪ 10^12).
- Rounding: half-up at scale ``s``, matching the Cast's HALF_UP —
  **for LINEAR-magnitude measures only** (|e| ≲ 10^9 at scale 6).
  Spark's cast rounds the double's shortest decimal STRING; this
  path rounds the exact BINARY fraction. The two agree whenever
  ulp(e) ≪ 10^-s; once |e| is large enough that the 6th decimal
  digit sits at the double's precision edge (price², ~1.2e10:
  ulp ≈ 2e-6) they legitimately disagree on ~0.05% of values —
  measured, and pinned as a NEGATIVE test. The same applies when
  the target scale is COARSER than the data's intrinsic decimal
  granularity (a 4dp product rounded at scale 2 places exact .5
  ties on the target digit — ~1% of lineitem rows split). So:
  quadratic moment sums and coarser-than-granularity scales keep
  the decimal cast; only finer-than-granularity linear-magnitude
  sums migrate.
  tests/test_fastdec.py sweeps every double fixture column at two
  scale factors plus boundary/extreme constructions and asserts
  bit-equality of the two Spark paths; the oracle gate re-proves
  value parity per migrated query.

NULL propagates (every building block is null-strict); NaN/±Inf
raise under ANSI in both paths (CAST_OVERFLOW vs INVALID casts —
both loud).
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Column, functions as F


def scaled_long(e: Column, scale: int = 6) -> Column:
    """``round_half_up(e · 10^scale)`` as a LONG, allocation-free.

    Exact wherever the result fits a long; ANSI raises on overflow
    (|e| > ~9.2·10^(18−scale)).
    """
    mult = 10**scale
    a = F.abs(e)
    ip = F.floor(a)  # exact: floor of a double is a double-integer
    fr = a - ip  # exact: Sterbenz-style lossless subtraction
    f_scaled = F.floor(fr * F.lit(float(mult)) + F.lit(0.5))
    mag = ip.cast("long") * F.lit(mult).cast("long") + f_scaled.cast("long")
    return F.when(e >= 0, mag).otherwise(-mag)


def dec_sum(e: Column, scale: int = 6) -> Column:
    """Exact decimal sum of a double expression at ``scale`` —
    value-identical to ``F.sum(e.cast(f"decimal(38,{scale})"))`` but
    with long-only per-row work. Returns decimal(38,scale); callers
    cast to double exactly as before (decimal→double is the same
    correctly-rounded BigDecimal conversion on the grouped rows)."""
    s = F.sum(scaled_long(e, scale).cast("decimal(38,0)"))
    unscale = Decimal(1).scaleb(-scale)  # 10^-scale, exact decimal
    return s * F.lit(unscale)
