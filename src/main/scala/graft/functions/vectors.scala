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

  /** cosine(a,b) = dot(a,b) / (‖a‖·‖b‖), exactly this association.
    * Higher-order-function formulation — interpretable everywhere but
    * NOT whole-stage-codegen'd; the hot paths use [[cosineFast]],
    * which computes the bit-identical value in one generated loop. */
  def cosineSimilarity(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

  /** Codegen'd cosine (graft.plans.CosineSim): same strict fold, same
    * result to the last ulp, ~one tight loop per row instead of
    * per-element interpreted lambdas. Takes array<float|double>
    * directly — no toDouble transform needed. */
  def cosineFast(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.{Bridge, CosineSim}
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))
  }

  /** Squared euclidean distance (avoids the sqrt when only ranking). */
  def squaredL2Distance(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0),
      (acc, v) => acc + v)

  /** Deterministic pseudo-random hyperplane matrix (splitmix64),
    * generated DRIVER-side and embedded as plain literals. Because the
    * planes are constants (not data-dependent hashes), the exact same
    * numbers can be inlined into an external SQL mirror of the plan —
    * which is how the LSH queries stay DuckDB-oracle-checkable. */
  def planeMatrix(seed: Long, nPlanes: Int, dim: Int): Seq[Array[Double]] = {
    var x = seed
    def next(): Long = {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    (0 until nPlanes).map { _ =>
      Array.fill(dim)(((next() >>> 11).toDouble / 9007199254740992.0) * 2.0 - 1.0)
    }
  }

  /** Σ vᵢ·litᵢ against a literal plane, as the same strict left fold
    * in double as [[dotProduct]] (mirrorable via DuckDB list_reduce). */
  def dotLit(v: Column, plane: Array[Double]): Column =
    aggregate(
      zip_with(v, typedLit(plane.toSeq), (x, y) => x.cast("double") * y),
      lit(0.0), (acc, t) => acc + t)

  /** Sign-pattern bucket id against a literal plane matrix. */
  def hyperplaneBucketLit(v: Column, planes: Seq[Array[Double]]): Column = {
    require(planes.size <= 62, "bucket id packs into a Long")
    planes.zipWithIndex.map { case (p, i) =>
      when(dotLit(v, p) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Multi-table LSH bucket ids: one sign-pattern bucket per table,
    * each table with its own plane matrix. Returns array<long>.
    * HOF formulation — parity reference for [[multiTableBucketsFast]]. */
  def multiTableBuckets(v: Column, tables: Seq[Seq[Array[Double]]]): Column =
    array(tables.map(planes => hyperplaneBucketLit(v, planes)): _*)

  /** Codegen'd multi-table bucketer (org.apache.spark.sql.graft
    * .HyperplaneBuckets): one generated triple loop, bit-identical
    * bucket ids to [[multiTableBuckets]]. */
  def multiTableBucketsFast(v: Column, tables: Seq[Seq[Array[Double]]]): Column = {
    import org.apache.spark.sql.graft.{Bridge, HyperplaneBuckets}
    val nTables = tables.size
    val nPlanes = tables.head.size
    val dim = tables.head.head.length
    require(tables.forall(t => t.size == nPlanes && t.forall(_.length == dim)),
      "all tables must share (nPlanes, dim)")
    val flat = Vector.newBuilder[Double]
    tables.foreach(_.foreach(p => p.foreach(flat += _)))
    Bridge.column(HyperplaneBuckets(
      Bridge.expression(v), flat.result(), nTables, nPlanes, dim))
  }

  /** Codegen'd single-table bucket id (Long). */
  def hyperplaneBucketFast(v: Column, planes: Seq[Array[Double]]): Column =
    element_at(multiTableBucketsFast(v, Seq(planes)), 1)

  /** Codegen'd IVF probe list: ids of the nProbe nearest centroids
    * (ascending squared-L2, ties to the lower id), array<int>. */
  def nearestCentroidsFast(v: Column, centroids: Seq[Array[Double]],
      nProbe: Int): Column = {
    import org.apache.spark.sql.graft.{Bridge, NearestCentroids}
    val dim = centroids.head.length
    require(centroids.forall(_.length == dim), "centroids must share dim")
    val flat = Vector.newBuilder[Double]
    centroids.foreach(c => c.foreach(flat += _))
    Bridge.column(NearestCentroids(
      Bridge.expression(v), flat.result(), centroids.size, dim, nProbe))
  }

  /** Codegen'd IVF cell assignment (nearest centroid id). */
  def assignCellFast(v: Column, centroids: Seq[Array[Double]]): Column =
    element_at(nearestCentroidsFast(v, centroids, 1), 1)

  // ── int8 storage quantization: the 4×-smaller embedding-at-rest
  // format (symmetric per-vector absmax scaling, the standard public
  // scheme). Arithmetic is pinned to oracle-mirrorable IEEE ops:
  // floor(x/scale + 0.5) instead of an engine round() whose
  // half-away/half-even convention could differ between engines. ──

  /** Per-vector quantization scale: absmax/127, floored at 1e-30 so
    * the all-zero vector quantizes to zeros instead of NaN. */
  def quantizeScale(v: Column): Column =
    greatest(
      aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double")))),
      lit(1e-30)) / 127.0

  /** Symmetric int8 code: floor(x/scale + 0.5) ∈ [-127, 127] by
    * construction of [[quantizeScale]]. Kept as int in the column
    * (the 1-byte width is a STORAGE property — parquet dictionary/
    * bit-packing encodes the narrow range; the arithmetic contract
    * is what the oracle mirrors). */
  def quantizeInt8(v: Column, scale: Column): Column =
    transform(v, x => floor(x.cast("double") / scale + 0.5).cast("int"))

  /** Dequantized vector: code × scale, array<double>. */
  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)
}
