package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash primitives shared with the correctness oracle.
  *
  * The engine's fast path hashes with xxhash64 (codegen'd, zero-alloc),
  * which external SQL engines cannot reproduce. For every
  * hash-dependent REGISTERED query we instead derive a 60-bit hash
  * from the md5 hex prefix — md5 is bit-identical everywhere, and 60
  * bits keeps the value positive in a signed 64-bit integer, so the
  * DuckDB oracle mirrors the whole computation verbatim:
  *
  *   Spark :  conv(substring(md5(s), 1, 15), 16, 10) :: long
  *   DuckDB:  CAST(('0x' || substr(md5(s),1,15)) AS BIGINT)
  */
object hashes {

  /** 60-bit md5-prefix hash of a string column (positive Long). */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** The DuckDB rendering of [[md5Hash60]] over SQL fragment `s`. */
  def md5Hash60Sql(s: String): String =
    s"CAST(('0x' || substr(md5($s),1,15)) AS BIGINT)"

  /** Order-sensitive rolling fingerprint of a token array: fold
    * acc' = md5Hash60(acc || '|' || token) with the accumulator carried
    * as its decimal string. Chained (unlike a commutative set hash),
    * so token reordering changes the fingerprint. Mirrored in DuckDB
    * by list_reduce over list_prepend('0', tokens). */
  def rollingFingerprint(tokens: Column): Column =
    aggregate(tokens, lit("0"), (acc, t) =>
      conv(substring(md5(concat(acc, lit("|"), t)), 1, 15), 16, 10))
      .cast("long")

  /** The DuckDB rendering of [[rollingFingerprint]] over a SQL list
    * fragment `toks`. */
  def rollingFingerprintSql(toks: String): String =
    "CAST(list_reduce(list_prepend('0', " + toks + "), (a,t) -> " +
      "CAST(CAST(('0x' || substr(md5(a || '|' || t),1,15)) AS BIGINT) AS VARCHAR)" +
      ") AS BIGINT)"
}
