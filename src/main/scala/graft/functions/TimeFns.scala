package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Time scalar-function vocabulary of the reference pipeline (SURVEY.md §2.6
  * C1–C5), as codegen-friendly Column combinators — no UDFs.
  *
  *  - C1: ISO-8601 `"%Y-%m-%dT%H:%M:%SZ"` parse (reference `src/main.py:89-92`)
  *  - C2: UTC → America/New_York conversion (`src/main.py:93-94`)
  *  - C3: epoch-nanoseconds → US/Eastern timestamp (`src/main.py:126-131`)
  *  - C4 is normalized to C3 (documented divergence — the reference's no-lines
  *    branch used the process-local timezone, `src/main.py:172-174`)
  *  - C5: timestamp → string rendering (`src/main.py:95,131,174`)
  *
  * Spark timestamps are microsecond-precision; the reference divides
  * nanoseconds by 1e9 into float seconds (`src/main.py:127`), so the sub-µs
  * truncation here loses nothing the reference kept.
  */
object TimeFns {
  val IsoUtcFormat = "yyyy-MM-dd'T'HH:mm:ss'Z'"
  val RenderFormat = "yyyy-MM-dd HH:mm:ss"

  /** C1 — parse the reference's ISO-8601 UTC string into a timestamp. */
  def parseIso(c: Column): Column = to_timestamp(c, IsoUtcFormat)

  /** C2 — shift a UTC timestamp to New York wall-clock time. */
  def toNewYork(ts: Column): Column = from_utc_timestamp(ts, "America/New_York")

  /** Exact nanos→micros division — through DECIMAL, never double: epoch
    * nanos (~1.7e18) exceeds double's 53-bit integer range, so a double
    * round-trip silently loses the low digits. Decimal division is exact
    * base-10; the long cast truncates toward zero (= floor for the
    * post-1970 epochs this engine handles). */
  def nanosToMicros(ns: Column): Column =
    (ns.cast("decimal(25,0)") / lit(1000)).cast(LongType)

  /** C3 (first half) — epoch-nanoseconds long → UTC timestamp. */
  def nanosToTimestamp(ns: Column): Column = timestamp_micros(nanosToMicros(ns))

  /** C3 — epoch-nanoseconds → US/Eastern wall-clock timestamp. */
  def nanosToEastern(ns: Column): Column =
    from_utc_timestamp(nanosToTimestamp(ns), "US/Eastern")

  /** C4 — epoch-nanoseconds → wall-clock in an EXPLICIT zone. The
    * reference's no-lines branch rendered `updated_at` in whatever zone
    * the process happened to run in (`src/main.py:172-174`) — an
    * environment dependency, which is why the engine normalizes to C3 by
    * default. Strict-parity callers name the machine zone here, which is
    * exactly what makes the behavior deterministic and oracle-checkable. */
  def nanosToZone(ns: Column, tz: String): Column =
    from_utc_timestamp(nanosToTimestamp(ns), tz)

  /** C5 — render a timestamp the way the sheet sink stringifies it. */
  def render(ts: Column): Column = date_format(ts, RenderFormat)

  /** Wall-clock timestamp → epoch seconds (stable cross-engine encoding for
    * oracle-checked outputs; avoids timestamp-typed output columns). */
  def epochSeconds(ts: Column): Column = unix_timestamp(ts)
}
