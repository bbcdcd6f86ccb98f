package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` embedding columns, built
  * from codegen'd higher-order functions (`zip_with`/`aggregate`) so
  * the whole computation stays inside Tungsten — no UDF, no
  * serialization of the array to JVM objects.
  *
  * Determinism note (oracle parity): every reduction is a strict
  * left-to-right fold in DOUBLE, the same evaluation order DuckDB's
  * `list_dot_product` uses, so results are bit-identical across
  * engines and across partitionings — there is no floating-point
  * reassociation anywhere.
  *
  * Scale note: on a 1000-executor cluster these evaluate per-row with
  * zero shuffle; a brute-force scan of N vectors for top-k is one map
  * + TakeOrderedAndProject (k per partition, then k at the driver).
  */
object vectors {

  /** Element-wise cast to double — do this once up front so all
    * arithmetic is double-precision regardless of storage type. */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Σ aᵢ·bᵢ as a strict left fold in double. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** cosine(a,b) = dot(a,b) / (‖a‖·‖b‖), exactly this association. */
  def cosineSimilarity(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

  /** Squared euclidean distance (avoids the sqrt when only ranking). */
  def squaredL2Distance(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0),
      (acc, v) => acc + v)

  /** Random-hyperplane signature (SimHash for vectors): sign pattern
    * of the vector against `nPlanes` pseudo-random hyperplanes derived
    * deterministically from `seed` — packs to a Long bucket id.
    * Hyperplane component h(p,i) is a hash-derived value in [-1,1).
    * Used as the LSH bucketer for approximate nearest neighbors.
    */
  def hyperplaneBucket(v: Column, nPlanes: Int, seed: Int): Column = {
    require(nPlanes <= 30, "bucket id packs into an Int range")
    // deterministic pseudo-random component: xxhash64 of (seed, plane, idx)
    def comp(plane: Int, idx: Column): Column =
      (pmod(xxhash64(lit(seed), lit(plane), idx), lit(2000001L)).cast("double")
        / 1000000.0) - 1.0
    val bits = (0 until nPlanes).map { p =>
      val dot = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x.cast("double") * comp(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
