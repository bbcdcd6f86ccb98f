// Hosted in an org.apache.spark.sql subpackage because the expression
// framework types it needs (AbstractDataType for ExpectsInputTypes,
// classic.ExpressionUtils for Column construction) are private[sql] —
// the standard packaging for third-party Catalyst extensions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.classic.ExpressionUtils

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd cosine similarity over two embedding arrays
  * (array<float> or array<double>) — the hot kernel of the
  * similarity/near-dup operators (SURVEY §2.11).
  *
  * Spark's higher-order functions (`zip_with`/`aggregate`) evaluate
  * their lambda per element through an interpreter and break
  * whole-stage codegen; this native expression generates one tight
  * primitive loop instead. Arithmetic is the SAME strict left-to-right
  * double fold as the HOF formulation in graft.functions.vectors (and
  * as DuckDB's list_dot_product), so results are bit-identical and
  * all existing oracles keep matching — asserted by ExpressionSpec.
  *
  * Length contract (applies to every fixed-dim kernel here: this one,
  * [[HyperplaneBuckets]], [[NearestCentroids]]): inputs are assumed
  * FIXED-DIMENSION embedding columns; a shorter array folds over its
  * prefix (min length), where the HOF/zip_with form would produce
  * NULL from the padded elements. The engine's embedding tables are
  * schema-enforced fixed-dim, so the cases never diverge in practice
  * — but a ragged-array corpus must validate lengths upstream.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(DoubleType), ArrayType(FloatType)),
    TypeCollection(ArrayType(DoubleType), ArrayType(FloatType)))

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (isFloat(left), isFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val getX = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $getX;
         |  double $yi = $getY;
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}


/** Codegen'd md5-based SimHash over a token array: per token, the
  * 60-bit md5-prefix hash (the oracle-mirrorable family — see
  * graft.functions.hashes) votes ±1 on each bit position; sign of the
  * accumulated vote becomes the output bit. Replaces a width-unrolled
  * interpreted `aggregate` lambda (width × tokens interpreted steps
  * per row) with one generated loop + a per-task MessageDigest.
  *
  * Bit-compatible with Dedup.simhash(width=60, hashFn=md5Hash60):
  * the 60-bit value equals CAST(('0x' || substr(md5(t),1,15)) AS
  * BIGINT) — i.e. the big-endian first 8 digest bytes >>> 4. Empty
  * token arrays yield all-bits-set (votes 0 ≥ 0), same as the HOF
  * form and the oracle's COALESCE.
  */
case class SimHashMd5(child: Expression, width: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(width > 0 && width <= 60, "md5-prefix hash provides 60 bits")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_md5"

  @transient private lazy val localDigest =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val md = localDigest.get()
    val votes = new Array[Int](width)
    var t = 0
    val n = toks.numElements()
    while (t < n) {
      md.reset()
      val digest = md.digest(toks.getUTF8String(t).getBytes)
      val h = SimHashMd5.prefix60(digest)
      var j = 0
      while (j < width) {
        votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < width) {
      if (votes(j) >= 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mdClass = "java.security.MessageDigest"
    val md = ctx.addMutableState(mdClass, "simhashMd",
      v => s"""try { $v = $mdClass.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) {
              |  throw new RuntimeException(e); }""".stripMargin)
    nullSafeCodeGen(ctx, ev, v => {
      val votes = ctx.freshName("votes")
      val t = ctx.freshName("t")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val dg = ctx.freshName("dg")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int[] $votes = new int[$width];
         |int $n = $v.numElements();
         |for (int $t = 0; $t < $n; $t++) {
         |  $md.reset();
         |  byte[] $dg = $md.digest($v.getUTF8String($t).getBytes());
         |  long $h = org.apache.spark.sql.graft.SimHashMd5.prefix60($dg);
         |  for (int $j = 0; $j < $width; $j++) {
         |    $votes[$j] += ((($h >>> $j) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < $width; $j++) {
         |  if ($votes[$j] >= 0) $out |= (1L << $j);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashMd5 {
  /** First 15 hex digits of the digest as a long: big-endian first 8
    * bytes >>> 4 — exactly CAST(('0x'||substr(md5(s),1,15)) AS BIGINT). */
  def prefix60(d: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }
}

/** Row kernel for [[WordShingles]] — one static call per row instead
  * of interpreted lambdas per token. Tokenization matches the HOF
  * pipeline exactly: lowercase (UTF8String.toLowerCase, the same
  * collation Spark's lower() uses), split on the Java `\s` class,
  * drop empties; n-grams space-joined, first-occurrence-distinct
  * (array_distinct semantics). */
object TextKernels {
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private def tokenize(text: org.apache.spark.unsafe.types.UTF8String): java.util.ArrayList[String] = {
    val lowered = text.toLowerCase.toString
    val toks = new java.util.ArrayList[String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    val len = lowered.length
    while (i < len) {
      val c = lowered.charAt(i)
      if (isWs(c)) {
        if (sb.length > 0) { toks.add(sb.toString); sb.setLength(0) }
      } else sb.append(c)
      i += 1
    }
    if (sb.length > 0) toks.add(sb.toString)
    toks
  }

  /** Token array (repeats kept, document order) — the kernel form of
    * the lower/split/filter HOF chain. */
  def tokens(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val toks = tokenize(text)
    val out = new Array[AnyRef](toks.size)
    var i = 0
    while (i < toks.size) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(toks.get(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  def shingles(text: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val toks = tokenize(text)
    val m = toks.size - (n - 1)
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    var j = 0
    while (j < m) {
      val s = new java.lang.StringBuilder
      var k = 0
      while (k < n) {
        if (k > 0) s.append(' ')
        s.append(toks.get(j + k))
        k += 1
      }
      seen.add(org.apache.spark.unsafe.types.UTF8String.fromString(s.toString))
      j += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}

/** Codegen'd whitespace tokenizer (see [[TextKernels.tokens]]):
  * element-identical to filter(split(trim(lower(c)),"\\s+"), len>0). */
case class Tokenize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokenize"

  override def nullSafeEval(v: Any): Any =
    TextKernels.tokens(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = org.apache.spark.sql.graft.TextKernels.tokens($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd word n-gram shingle set (see [[TextKernels.shingles]]):
  * element-for-element identical to the HOF formulation in
  * graft.functions.text.wordShingles (spec-asserted), so the dedup
  * oracles are unchanged. */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(v: Any): Any =
    TextKernels.shingles(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = org.apache.spark.sql.graft.TextKernels.shingles($v, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd matched-element count of two SORTED long arrays (what
  * sort_array over per-shingle hashes produces): one merge pass,
  * O(|a|+|b|) primitive comparisons — no object allocation, no
  * per-element interpreted lambda, no intermediate array.
  *
  * The hot kernel of the dense-corpus exact Jaccard join: every pair
  * of a broadcast nested-loop join evaluates one merge over the two
  * documents' sorted shingle-hash arrays. Because equal strings always
  * hash equal, the matched count is a PROVABLE UPPER BOUND on the true
  * string-set intersection (collisions can only inflate it), so a
  * threshold filter on it yields a candidate superset that exact
  * re-scoring reduces to the exact answer. Duplicated values match
  * pairwise (multiset semantics). */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_long_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var cnt = 0L
    val n = x.numElements(); val m = y.numElements()
    while (i < n && j < m) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { cnt += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    cnt
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $i = 0; int $j = 0; long $cnt = 0L;
         |int $n = $a.numElements(); int $m = $b.numElements();
         |while ($i < $n && $j < $m) {
         |  long $xi = $a.getLong($i); long $yj = $b.getLong($j);
         |  if ($xi == $yj) { $cnt++; $i++; $j++; }
         |  else if ($xi < $yj) $i++;
         |  else $j++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd count-min-sketch frequency probe over a string column:
  * `estimateCount(token)` against a plan-time sketch object (driver-
  * built from ONE bounded aggregate row, shipped to executors as a
  * codegen reference object). Used as a pre-shuffle candidate filter —
  * CMS estimates never undercount, so filtering on `estimate >=
  * threshold` keeps a superset of the truly-frequent keys and an exact
  * downstream aggregate evicts the overestimated extras.
  *
  * Probes hash the item's UTF-8 bytes (the `addBinary` family) — the
  * SAME key Spark's builtin `count_min_sketch` aggregate adds for
  * StringType values, so estimates are true upper bounds of that
  * aggregate's counts. */
case class CmsEstimate(child: Expression,
    sketch: org.apache.spark.util.sketch.CountMinSketch)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def nullSafeEval(v: Any): Any =
    sketch.estimateCount(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsSketch", sketch,
      "org.apache.spark.util.sketch.CountMinSketch")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $ref.estimateCount($v.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** private[sql] API bridge for code living in the graft.* packages. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A DataFrame over an explicit logical plan (classic
    * Dataset.ofRows is private[sql]). Lets a caller PIN a plan it
    * obtained under temporary session state — e.g. q93 captures the
    * plan the opt-in ANN rewrite produced, then restores the conf so
    * the opt-in cannot leak into later queries. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Release the cached blocks behind every locally-checkpointed
    * Dataset reachable in this plan. `Dataset.unpersist` only covers
    * CacheManager entries; a local checkpoint's blocks are owned by
    * its underlying RDD (reachable through the LogicalRDD nodes the
    * checkpoint produced). Iterative operators use this to free
    * superseded iterations immediately, and Bench/Verify drain each
    * query's result after consuming it — otherwise the blocks live
    * until driver GC + ContextCleaner get around to them, which in a
    * 58-query session left earlier queries' dedup state resident when
    * later queries needed the memory (q49: 7.6 s driver vs 2.5 s
    * isolated in round 3). Traverses the whole analyzed plan, so it
    * also catches checkpoints composed under further transforms.
    * No-op on plans with no checkpoint. The freed Dataset must not be
    * recomputed afterwards (checkpoint lineage is truncated). */
  /** Drain the async listener bus so a just-finished query's stage
    * events are visible to a measuring SparkListener before the next
    * query starts (Bench's per-query parallelism attribution).
    * LiveListenerBus is private[spark]; this bridge is the sanctioned
    * crossing. Bounded wait: a wedged bus should surface as a bench
    * failure, not a hang. */
  def drainListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(30000L)

  def freeLocalCheckpoint(ds: org.apache.spark.sql.Dataset[_]): Unit = ds match {
    case c: org.apache.spark.sql.classic.Dataset[_] =>
      c.queryExecution.analyzed.foreach {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(blocking = false)
        case _ => ()
      }
    case _ => ()
  }
}

/** Codegen'd multi-table hyperplane-LSH bucketer: for each of
  * `nTables` plane matrices (flattened row-major into `planesFlat`),
  * the sign pattern of the vector against that table's `nPlanes`
  * planes, packed into a Long — array<long> of `nTables` bucket ids
  * per row.
  *
  * One generated triple loop replaces the HOF formulation in
  * graft.functions.vectors.multiTableBuckets, whose per-element
  * interpreted lambdas (tables × planes × dim per row) dominated the
  * near-dup query. Dot products accumulate in the same strict
  * left-to-right double order, so bucket assignments are bit-identical
  * to the HOF version and to the oracle SQL mirror.
  */
case class HyperplaneBuckets(child: Expression, planesFlat: Vector[Double],
    nTables: Int, nPlanes: Int, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(DoubleType), ArrayType(FloatType)))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  @transient private lazy val mat: Array[Double] = planesFlat.toArray

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val fl = isFloat
    val n = math.min(dim, x.numElements())
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        val base = (t * nPlanes + p) * dim
        var dot = 0.0
        var i = 0
        while (i < n) {
          val xi = if (fl) x.getFloat(i).toDouble else x.getDouble(i)
          dot += xi * mat(base + i)
          i += 1
        }
        if (dot >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("planes", mat, "double[]")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      val base = ctx.freshName("base")
      val get = if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |long[] $out = new long[$nTables];
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |for (int $t = 0; $t < $nTables; $t++) {
         |  long $bucket = 0L;
         |  for (int $p = 0; $p < $nPlanes; $p++) {
         |    int $base = ($t * $nPlanes + $p) * $dim;
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dot += $get * $m[$base + $i];
         |    }
         |    if ($dot >= 0) $bucket |= (1L << $p);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd IVF coarse-quantizer probe: the ids of the `nProbe`
  * centroids nearest to the vector (ascending squared-L2 distance,
  * ties to the lower id), as array<int>. `nProbe = 1` is cell
  * assignment; larger values give the multi-probe search list.
  *
  * Distances accumulate (xᵢ-cᵢ)² in strict left-to-right double
  * order so the DuckDB oracle mirrors the values exactly from the
  * same centroid literals; selection is repeated strict-< min scans,
  * which matches SQL `ORDER BY dist, cell` tie-breaking.
  */
case class NearestCentroids(child: Expression, centroidsFlat: Vector[Double],
    nCentroids: Int, dim: Int, nProbe: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nProbe >= 1 && nProbe <= nCentroids)

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(DoubleType), ArrayType(FloatType)))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  @transient private lazy val mat: Array[Double] = centroidsFlat.toArray

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val fl = isFloat
    val n = math.min(dim, x.numElements())
    val d = new Array[Double](nCentroids)
    var c = 0
    while (c < nCentroids) {
      val base = c * dim
      var acc = 0.0
      var i = 0
      while (i < n) {
        val xi = if (fl) x.getFloat(i).toDouble else x.getDouble(i)
        val diff = xi - mat(base + i)
        acc += diff * diff
        i += 1
      }
      d(c) = acc
      c += 1
    }
    val out = new Array[Int](nProbe)
    val taken = new Array[Boolean](nCentroids)
    var p = 0
    while (p < nProbe) {
      var best = -1
      var cc = 0
      while (cc < nCentroids) {
        if (!taken(cc) && (best == -1 || d(cc) < d(best))) best = cc
        cc += 1
      }
      taken(best) = true
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("centroids", mat, "double[]")
      val d = ctx.freshName("d")
      val out = ctx.freshName("out")
      val taken = ctx.freshName("taken")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val cc = ctx.freshName("cc")
      val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      val base = ctx.freshName("base")
      val best = ctx.freshName("best")
      val get = if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |double[] $d = new double[$nCentroids];
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |for (int $c = 0; $c < $nCentroids; $c++) {
         |  int $base = $c * $dim;
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $diff = $get - $m[$base + $i];
         |    $acc += $diff * $diff;
         |  }
         |  $d[$c] = $acc;
         |}
         |int[] $out = new int[$nProbe];
         |boolean[] $taken = new boolean[$nCentroids];
         |for (int $p = 0; $p < $nProbe; $p++) {
         |  int $best = -1;
         |  for (int $cc = 0; $cc < $nCentroids; $cc++) {
         |    if (!$taken[$cc] && ($best == -1 || $d[$cc] < $d[$best])) $best = $cc;
         |  }
         |  $taken[$best] = true;
         |  $out[$p] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
