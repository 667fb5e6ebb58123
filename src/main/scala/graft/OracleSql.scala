package graft

/** DuckDB SQL fragments for oracling the FNV-based custom expressions.
  *
  * FNV-1a 64 ([[graft.functions.SimHashImpl.fnv1a]], public-domain
  * constants) is wrap-around unsigned 64-bit arithmetic; DuckDB BIGINT
  * errors on overflow, so the oracle folds in HUGEINT (int128) and
  * reduces mod 2^64 each step — bit-identical to the JVM kernel
  * (verified: fnv1a("hello") = 11831194018420276491 in both). Only
  * valid for ASCII text (`ord(substr)` = byte value); the synthetic
  * corpus is pure ASCII at every scale factor, which the oracles'
  * host queries rely on. Further whitespace caveat: the engines'
  * `\s` classes differ at the edges (Java includes \x0B, RE2
  * includes \f but not \x0B, the SimHash kernel treats only
  * space/\t/\n/\r as token breaks) — equivalent on this corpus,
  * which contains neither \f nor \x0B at any scale factor
  * (verified), but a corpus with those control chars would need one
  * shared explicit character class.
  */
object OracleSql {
  val FnvOffset = "14695981039346656037"
  val FnvPrime = "1099511628211"
  val TwoPow64 = "18446744073709551616"
  val TwoPow63 = "9223372036854775808"

  /** Unsigned FNV-1a 64 (HUGEINT in [0, 2^64)) of string expression
    * `v`. Lambda variable names are prefixed to avoid capture when
    * nested inside an outer `list_transform`. */
  def fnvU(v: String): String =
    s"""list_reduce(
          list_prepend($FnvOffset::HUGEINT,
            list_transform(range(1, len($v)+1), fnv_i -> ord(substr($v, fnv_i, 1))::HUGEINT)),
          (fnv_a, fnv_b) -> ((xor(fnv_a, fnv_b)) * $FnvPrime::HUGEINT) % $TwoPow64::HUGEINT)"""

  /** The JVM's signed-long view of an unsigned HUGEINT expression. */
  def toSigned(v: String): String =
    s"CAST(CASE WHEN $v >= $TwoPow63::HUGEINT THEN $v - $TwoPow64::HUGEINT ELSE $v END AS BIGINT)"

  /** 2^b as HUGEINT for a lambda/row variable `b` (exact for b ≤ 63:
    * the DOUBLE power is a power of two). */
  def pow2(b: String): String = s"(2::HUGEINT ^ $b)::HUGEINT"
}
