package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  ArrayIntersect, ArraysOverlap, AttributeReference, AttributeSet,
  Descending, EqualTo, Expression, GetArrayItem, GreaterThan,
  IntegerLiteral, Literal, Not, Or, PredicateHelper, ScalarSubquery,
  Size, SortOrder}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, GlobalLimit, Join, JoinHint, LocalLimit, LogicalPlan, Project,
  Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.graft.{Bridge, CosineSim, HyperplaneBuckets}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, IntegerType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Optimizer rule: rewrite set-overlap TESTS phrased as intersection
  * counts into the short-circuiting predicate —
  *
  *   size(array_intersect(a, b)) > 0   →  arrays_overlap(a, b)
  *   size(array_intersect(a, b)) = 0   →  NOT arrays_overlap(a, b)
  *
  * `array_intersect` materializes the full intersection (hash set of
  * one side + membership scan of the other, building a result array)
  * only for `size` to reduce it to a boolean; `arrays_overlap` stops
  * at the FIRST common element. For the decontamination filters
  * (Dedup.flagContaminated and the q66 pipeline) — where contaminated
  * docs usually hit on an early shingle — the declarative
  * intersection-count form stays in the API while every plan gets the
  * short-circuit. The rewrite preserves Catalyst's null semantics,
  * firing only when it is provably equivalence-preserving:
  *
  *  - both element types must be non-nullable: with a null element on
  *    one side only, the no-overlap result is `null` for
  *    arrays_overlap but `0` for the intersection count;
  *  - legacy sizeOfNull (size(null) = -1) additionally requires both
  *    inputs non-nullable, since -1 > 0 is false where
  *    arrays_overlap(null, b) is null.
  */
object IntersectNonEmptyToOverlap extends Rule[LogicalPlan] {

  private def rewritable(intersect: ArrayIntersect,
      legacySizeOfNull: Boolean): Boolean = {
    def nonNullElems(e: Expression): Boolean = e.dataType match {
      case ArrayType(_, containsNull) => !containsNull
      case _ => false
    }
    val Seq(a, b) = intersect.children
    nonNullElems(a) && nonNullElems(b) &&
      (!legacySizeOfNull || (!a.nullable && !b.nullable))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GreaterThan(Size(ai: ArrayIntersect, legacy), Literal(0, IntegerType))
          if rewritable(ai, legacy) =>
        ArraysOverlap(ai.children.head, ai.children.last)
      case EqualTo(Size(ai: ArrayIntersect, legacy), Literal(0, IntegerType))
          if rewritable(ai, legacy) =>
        Not(ArraysOverlap(ai.children.head, ai.children.last))
    }
}

/** Optimizer rule: rewrite exact cosine top-k against a PLAN-TIME
  * LITERAL query vector —
  *
  *   ... ORDER BY cosine_sim(emb, <literal>) DESC [, tiebreak] LIMIT k
  *
  * — into the hyperplane-LSH-pruned plan: a multi-table bucket-
  * collision `Filter` is inserted under the Sort, so the exact-cosine
  * rank runs only over vectors that share a bucket with the query in
  * at least one table, instead of over the whole corpus. At 100 TB
  * the unrewritten plan is a full scan computing n cosines per query;
  * the rewritten plan computes T cheap sign-pattern buckets per row
  * (codegen'd, pushed below the projection by PushDownPredicates) and
  * cosines only for the ~T·n/2^planes candidates.
  *
  * This trades recall for work, so it is an EXPLICIT OPT-IN:
  * the rule only fires when `spark.graft.ann.rewrite` = true —
  * enabling it declares that every literal-query cosine top-k in the
  * session may return approximate results (the standard AQP-switch
  * contract). Sizing knobs, with the same derivations the library
  * uses elsewhere ([[graft.operators.Similarity.planesForSize]] /
  * `lshTablesForRecall`):
  *
  *  - `spark.graft.ann.rewrite.planes` (default 4): planes per table;
  *  - `spark.graft.ann.rewrite.tables` (default 8): tables — more
  *    tables, higher recall, more candidates;
  *  - `spark.graft.ann.rewrite.seed`   (default 93): plane RNG seed.
  *
  * Because the planes are seeded literals and the query vector is a
  * literal, the rewritten plan is fully deterministic: an external
  * oracle (q93) inlines the same plane matrices and reproduces the
  * approximate result EXACTLY. The query side may also be an
  * UNCORRELATED DETERMINISTIC SCALAR SUBQUERY — the "query vector
  * from a lookup" shape (`ORDER BY cosine_sim(emb, (SELECT embedding
  * FROM t WHERE id = :q)) DESC LIMIT k`) — which the rule evaluates
  * driver-side as a bounded one-row planning lookup to derive the
  * bucket predicate ([[queryLiteral]]). The rule never fires when the
  * query side is a joined column (q28's one-row join build, q32/q54's
  * vector-vector self-joins), when the sort is not descending-first
  * on a bare `cosine_sim`, or when there is no limit above the sort;
  * a subtree that already carries a bucket filter is left alone (the
  * rule runs inside fixed-point batches).
  */
object AnnTopKToLshPrune extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.ann.rewrite"
  val PlanesKey = "spark.graft.ann.rewrite.planes"
  val TablesKey = "spark.graft.ann.rewrite.tables"
  val SeedKey = "spark.graft.ann.rewrite.seed"

  /** The query side as an eval()-able literal, when the expression is
    * a plan-time constant OR an uncorrelated, deterministic SCALAR
    * SUBQUERY — "the query vector from a lookup", e.g.
    * `cosine_sim(embedding, (SELECT embedding FROM t WHERE id = 0))`.
    * A subquery side is executed HERE, driver-side (the library's
    * q93/q97 planning-lookup convention, moved inside the optimizer).
    * Only the bucket predicate consumes the evaluated copy; the Sort
    * key keeps the original subquery, which the engine runs once at
    * execution as usual — a deterministic subquery yields the same
    * vector both times, which the determinism guard below makes a
    * requirement rather than a hope. Zero rows (scalar subquery →
    * null) or a null vector → no rewrite.
    *
    * Cost contract, stated honestly: the row count is bounded
    * (take(2)) but the subquery's own cost is whatever the caller
    * wrote — the engine executes that exact subquery at runtime
    * anyway, so the rewrite adds at most ONE extra run of it; and
    * when the rewrite ends up NOT firing (null lookup), each fresh
    * re-optimization of the same DataFrame pays the lookup again.
    * Both are the price of the opt-in switch, on the query shape
    * that opted in. */
  private[plans] def queryLiteral(e: Expression): Option[Expression] = e match {
    case _ if e.foldable => Some(e)
    case sq: ScalarSubquery
        if sq.outerAttrs.isEmpty && sq.joinCond.isEmpty &&
          sq.deterministic =>
      val spark = org.apache.spark.sql.SparkSession.active
      val rows =
        org.apache.spark.sql.graft.Bridge.ofRows(spark, sq.plan).take(2)
      if (rows.length == 1 && !rows(0).isNullAt(0))
        Some(Literal.create(rows(0).get(0), sq.dataType))
      else None
    case _ => None
  }

  /** (embedding expr, literal query expr) when exactly one side of the
    * cosine is a resolvable query vector ([[queryLiteral]]) — the
    * shape the bucket prune applies to. */
  private def split(cos: CosineSim): Option[(Expression, Expression)] =
    (queryLiteral(cos.left), queryLiteral(cos.right)) match {
      case (None, Some(q)) => Some((cos.left, q))
      case (Some(q), None) => Some((cos.right, q))
      case _ => None
    }

  /** Fixed-point guard: the pruning filter may have been pushed below
    * intervening projections by PushDownPredicates, so look for ANY
    * Filter carrying a bucket expression in the subtree. A subtree
    * that scans a REGISTERED at-rest index ([[AnnIndex]]) is also
    * treated as pruned: either [[AnnTopKToIndexScan]] already served
    * this top-k from the store (its shortlist sort must not be
    * re-pruned — that would change the index's recall contract), or
    * the user is querying the store directly. One approximation per
    * plan; whichever opt-in fires first wins deterministically by
    * injection order. */
  private def alreadyPruned(p: LogicalPlan, idxPaths: Seq[String]): Boolean =
    p.exists {
      case Filter(cond, _) => cond.exists(_.isInstanceOf[HyperplaneBuckets])
      case _ => false
    } || idxPaths.exists(AnnIndex.scansPath(p, _))

  /** Bucket-collision predicate: OR over tables of
    * `bucket_t(emb) = bucket_t(query)`. One single-table
    * HyperplaneBuckets per term keeps total per-row work at exactly
    * tables × planes × dim multiply-adds (no duplicated dot
    * products); the query-side buckets are evaluated here, driver-
    * side, through the SAME kernel, so row and query arithmetic agree
    * bit-for-bit. */
  private def prunePredicate(emb: Expression, qLit: Expression,
      nTables: Int, nPlanes: Int, seed: Long, dim: Int): Expression = {
    val tables = (0 until nTables).map(t =>
      graft.functions.vectors.planeMatrix(seed + t, nPlanes, dim))
    val qBuckets = tables.map { planes =>
      val flat = planes.flatten.toVector
      HyperplaneBuckets(qLit, flat, 1, nPlanes, dim)
        .eval().asInstanceOf[ArrayData].toLongArray()(0)
    }
    tables.zip(qBuckets).map { case (planes, qb) =>
      val flat = planes.flatten.toVector
      EqualTo(
        GetArrayItem(HyperplaneBuckets(emb, flat, 1, nPlanes, dim), Literal(0)),
        Literal(qb)): Expression
    }.reduce(Or(_, _))
  }

  /** Rewrite the Sort's child when the descending-first key is a
    * literal-query cosine; None when the shape doesn't apply. */
  private def prunedSort(s: Sort, nTables: Int, nPlanes: Int,
      seed: Long, idxPaths: Seq[String]): Option[Sort] = s match {
    case Sort(SortOrder(cos: CosineSim, Descending, _, _) +: _, true, child, _)
        if !alreadyPruned(child, idxPaths) =>
      split(cos) match {
        case Some((emb, qLit)) if qLit.eval() != null =>
          val dim = qLit.eval().asInstanceOf[ArrayData].numElements()
          val pred = prunePredicate(emb, qLit, nTables, nPlanes, seed, dim)
          Some(s.copy(child = Filter(pred, child)))
        case _ => None
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "false").toBoolean) return plan
    val nPlanes = conf.getConfString(PlanesKey, "4").toInt
    val nTables = conf.getConfString(TablesKey, "8").toInt
    val seed = conf.getConfString(SeedKey, "93").toLong
    // loud on bad knobs: planes beyond 62 would silently wrap the
    // Long bucket packing (1L << p is mod-64), degrading pruning
    // without an error anywhere downstream
    require(nPlanes >= 1 && nPlanes <= 62,
      s"$PlanesKey must be in [1, 62]: $nPlanes")
    require(nTables >= 1, s"$TablesKey must be >= 1: $nTables")
    val idxPaths = AnnIndex.all(conf).map(_.indexPath)
    plan.transform {
      // the two post-optimization shapes of ORDER BY … LIMIT k: the
      // projection either sits above the limit or has been pushed
      // between LocalLimit and Sort (PushProjectionThroughLimit)
      case gl @ GlobalLimit(_, ll @ LocalLimit(_, s: Sort)) =>
        prunedSort(s, nTables, nPlanes, seed, idxPaths)
          .map(ns => gl.copy(child = ll.copy(child = ns)))
          .getOrElse(gl)
      case gl @ GlobalLimit(_, ll @ LocalLimit(_, p @ Project(_, s: Sort))) =>
        prunedSort(s, nTables, nPlanes, seed, idxPaths)
          .map(ns => gl.copy(child = ll.copy(child = p.copy(child = ns))))
          .getOrElse(gl)
    }
  }
}

/** Registry of AT-REST ANN indexes: the metadata [[AnnTopKToIndexScan]]
  * needs to serve an exact-cosine top-k over a PRIMARY embedding table
  * from its stored (bucket, int8 codes, scale) companion — the q101
  * composition (quantized clustered store → probe-ball prune →
  * dequantized shortlist → exact re-rank), selected by the OPTIMIZER
  * instead of hand-written driver code.
  *
  * Registration is session-scoped conf state
  * (`spark.graft.ann.index.<name>` = encoded fields), so it survives
  * `SparkSession.cloneSession`, is inspectable with SET, and — like
  * `spark.graft.ann.rewrite` — IS the opt-in: registering an index
  * declares that cosine top-k queries against its primary table may be
  * answered approximately from the store, under the recall contract
  * the store was built with (probeRadiusForRecall). No registration,
  * no rewrite, exact results.
  *
  * Paths are normalized to absolute file paths and matched scheme-
  * blind (`Path.toUri.getPath`): two stores on different filesystems
  * with the SAME absolute path would alias — keep store paths unique,
  * which every real lake layout does.
  *
  * APPEND LIFECYCLE: a store that takes `Layout.clusteredAppend`
  * segments after [[save]]/[[register]] needs NO metadata refresh —
  * Meta records paths and build knobs only (never a segment list),
  * and [[AnnTopKToIndexScan]] reads the store ROOT, so partition
  * discovery picks up new `seg=` directories at every plan
  * (RulesSpec pins this). Only a change to the BUILD parameters
  * (planes seed/count, quantization, radius contract) requires a
  * rebuild + re-save — and those cannot change on append, because
  * appended segments are bucketed with the same registered planes. */
object AnnIndex {

  val Prefix = "spark.graft.ann.index."

  /** One registered index: where the primary table and the quantized
    * store live, the store's column names, the hyperplane family the
    * store's bucket column was built with (seed/planes/dim — the
    * planeMatrix convention, so the rule re-derives the exact
    * matrices), the probe radius (derive via probeRadiusForRecall),
    * and the shortlist size m (the rule serves any `LIMIT k` with
    * k <= m; re-rank is exact over m candidates). */
  final case class Meta(name: String, primaryPath: String,
      indexPath: String, idCol: String, embCol: String, bucketCol: String,
      codesCol: String, scaleCol: String, planesSeed: Long, nPlanes: Int,
      dim: Int, radius: Int, shortlist: Int)

  private def norm(p: String): String = new java.io.File(p).getAbsolutePath

  private[plans] def encode(m: Meta): String = {
    val fields = Seq(
      "primary" -> norm(m.primaryPath), "index" -> norm(m.indexPath),
      "id" -> m.idCol, "emb" -> m.embCol, "bucket" -> m.bucketCol,
      "codes" -> m.codesCol, "scale" -> m.scaleCol,
      "seed" -> m.planesSeed.toString, "planes" -> m.nPlanes.toString,
      "dim" -> m.dim.toString, "radius" -> m.radius.toString,
      "shortlist" -> m.shortlist.toString)
    fields.foreach { case (k, v) =>
      require(!v.contains(";") && !v.contains("="),
        s"AnnIndex field $k must not contain ';' or '=': $v")
    }
    fields.map { case (k, v) => s"$k=$v" }.mkString(";")
  }

  private[plans] def decode(name: String, s: String): Meta = {
    val kv = s.split(";").map { f =>
      val Array(k, v) = f.split("=", 2); k -> v
    }.toMap
    Meta(name, kv("primary"), kv("index"), kv("id"), kv("emb"),
      kv("bucket"), kv("codes"), kv("scale"), kv("seed").toLong,
      kv("planes").toInt, kv("dim").toInt, kv("radius").toInt,
      kv("shortlist").toInt)
  }

  def register(spark: SparkSession, meta: Meta): Unit = {
    require(meta.shortlist >= 1, s"shortlist must be >= 1: ${meta.shortlist}")
    require(meta.nPlanes >= 1 && meta.nPlanes <= 62,
      s"planes must be in [1, 62]: ${meta.nPlanes}")
    require(meta.radius >= 0 && meta.radius <= meta.nPlanes,
      s"radius ${meta.radius} outside [0, ${meta.nPlanes}]")
    spark.conf.set(Prefix + meta.name, encode(meta))
  }

  def unregister(spark: SparkSession, name: String): Unit =
    spark.conf.unset(Prefix + name)

  private[plans] def all(conf: SQLConf): Seq[Meta] =
    conf.getAllConfs.toSeq.sortBy(_._1).collect {
      case (k, v) if k.startsWith(Prefix) =>
        decode(k.stripPrefix(Prefix), v)
    }

  /** Root paths of a file-source leaf (empty for anything else),
    * scheme-blind. */
  private[plans] def rootPaths(p: LogicalPlan): Seq[String] = p match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toUri.getPath)
      case _ => Nil
    }
    case _ => Nil
  }

  private[plans] def scansPath(p: LogicalPlan, path: String): Boolean =
    p.exists(rootPaths(_).contains(path))

  /** True when the DataFrame's optimized plan reads the index store —
    * the loud post-hoc assertion for a caller that registered an index
    * and expects it to serve (silent fallback to a full exact scan is
    * a correctness non-event but a 100 TB cost event). */
  def servedBy(df: DataFrame, indexPath: String): Boolean =
    scansPath(df.queryExecution.optimizedPlan, norm(indexPath))

  val MetaFile = "_graft_index.meta"

  /** Persist the metadata INSIDE the store directory — the store
    * becomes self-describing (the `_metadata`/`_delta_log` lake
    * convention), so any later session can adopt it without re-stating
    * the build parameters (whose silent drift — wrong seed, wrong
    * radius — would quietly serve garbage shortlists). Hadoop FS API,
    * so object-store lakes work unchanged. */
  def save(spark: SparkSession, meta: Meta): Unit = {
    val p = new org.apache.hadoop.fs.Path(norm(meta.indexPath), MetaFile)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write((meta.name + "\n" + encode(meta) + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read a store's persisted metadata; loud on a missing or
    * malformed file. The returned meta's `indexPath` is the path the
    * file was READ from, not the path recorded at save time — a
    * store that was moved or mounted elsewhere registers where it
    * actually lives. */
  def load(spark: SparkSession, indexPath: String): Meta = {
    val p = new org.apache.hadoop.fs.Path(norm(indexPath), MetaFile)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(p),
      s"no $MetaFile under $indexPath — not a graft ANN store " +
        "(build it with clusteredWrite, then AnnIndex.save)")
    val in = fs.open(p)
    val content =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val lines = content.trim.split("\n")
    require(lines.length == 2, s"malformed $MetaFile under $indexPath")
    decode(lines(0), lines(1)).copy(indexPath = norm(indexPath))
  }

  /** Adopt a stored index in THIS session: load + register. */
  def registerFrom(spark: SparkSession, indexPath: String): Meta = {
    val m = load(spark, indexPath)
    register(spark, m)
    m
  }
}

/** Optimizer rule: INDEX SELECTION for exact cosine top-k — the
  * production shape the hand-composed q101 plan demonstrates, planned
  * automatically. For
  *
  *   SELECT … FROM primary [WHERE p(id)]
  *   ORDER BY cosine_sim(emb, <query>) DESC [, tiebreak] LIMIT k
  *
  * over a table with a REGISTERED at-rest index ([[AnnIndex]]), the
  * rule replaces the primary scan with
  *
  *   primary LEFT SEMI JOIN (top-m shortlist from the store) ON id
  *
  * where the shortlist subplan is exactly q101's index navigation:
  * scan ONLY the probe-ball buckets of the quantized store (Hamming
  * radius from the registered recall contract; the bucket `isin`
  * prunes whole range-clustered files via parquet stats), rank by
  * cosine over DEQUANTIZED int8 codes, keep the top m ids. The user's
  * Sort + Limit stay in place above the join, so the final k rows are
  * re-ranked by EXACT full-precision cosine — approximation only
  * narrows the candidate set, it never produces a ranking score. The
  * shortlist is m rows, so Catalyst broadcasts the semi-join build
  * side; no driver-side execution happens at plan time (the only
  * eval is the query vector's own bucket, pure arithmetic on the
  * literal — the planes go through the SAME HyperplaneBuckets kernel
  * as the stored column).
  *
  * Deterministic user filters referencing ONLY the id column (e.g.
  * `vec_id <> 0`, inferred IsNotNull) are TRANSPLANTED into the
  * shortlist scan — candidates the outer query would discard must not
  * occupy shortlist slots, or the served result would differ from the
  * hand-built composition (and the DuckDB oracle) by exactly those
  * slots. Filters on other columns stay outer-only: they still apply
  * (the semi-join keeps primary rows), but each one that drops a
  * shortlisted candidate costs a result row — the standard covered-
  * index contract.
  *
  * The rule does NOT fire when: no index is registered (the opt-in);
  * k > the registered shortlist size; the sort is not descending-first
  * on cosine_sim of the primary's embedding attribute against a
  * plan-time query vector ([[AnnTopKToLshPrune.queryLiteral]]: a
  * literal or an uncorrelated deterministic scalar subquery); the
  * subtree already scans the index (fixed point) or carries an LSH
  * prune ([[AnnTopKToLshPrune]] fired first — one approximation per
  * plan); or the primary relation appears more than once ambiguously.
  * Registered but mismatched stores fail LOUDLY on dimension
  * mismatch instead of silently serving wrong-dimension cosines. */
object AnnTopKToIndexScan extends Rule[LogicalPlan] with PredicateHelper {

  private def lshPruned(p: LogicalPlan): Boolean = p.exists {
    case Filter(cond, _) => cond.exists(_.isInstanceOf[HyperplaneBuckets])
    case _ => false
  }

  /** Rewrite `s` to serve from `m`'s store; None when the shape or the
    * registration doesn't apply. */
  private def serve(s: Sort, child: LogicalPlan, emb: AttributeReference,
      qLit: Expression, k: Int, m: AnnIndex.Meta): Option[Sort] = {
    if (!emb.name.equalsIgnoreCase(m.embCol) || k > m.shortlist) return None
    if (AnnIndex.scansPath(child, m.indexPath)) return None // fixed point
    val rels = child.collect {
      case lr: LogicalRelation
          if AnnIndex.rootPaths(lr).contains(m.primaryPath) &&
            lr.output.exists(_.exprId == emb.exprId) => lr
    }
    if (rels.size != 1) return None
    val rel = rels.head
    val idAttr = rel.output.find(_.name.equalsIgnoreCase(m.idCol)) match {
      case Some(a) => a
      case None => return None
    }
    val qVal = qLit.eval()
    if (qVal == null) return None
    val dim = qVal.asInstanceOf[ArrayData].numElements()
    require(dim == m.dim,
      s"AnnIndex ${m.name}: query vector dim $dim != registered dim ${m.dim}")
    // the query's bucket through the SAME kernel as the stored column
    val planes = graft.functions.vectors.planeMatrix(
      m.planesSeed, m.nPlanes, m.dim)
    val flat = planes.flatten.toVector
    val qb = HyperplaneBuckets(qLit, flat, 1, m.nPlanes, m.dim)
      .eval().asInstanceOf[ArrayData].toLongArray()(0)
    val probes =
      graft.operators.Similarity.probeBuckets(qb, m.nPlanes, m.radius)
    // transplant deterministic id-only conjuncts found on the spine
    // between the sort and the primary relation
    def containsRel(p: LogicalPlan): Boolean = p.exists(_ eq rel)
    def filtersAbove(p: LogicalPlan): Seq[Expression] =
      if (p eq rel) Nil
      else p match {
        case Filter(cond, c) if containsRel(c) =>
          splitConjunctivePredicates(cond) ++ filtersAbove(c)
        case _ =>
          p.children.find(containsRel).map(filtersAbove).getOrElse(Nil)
      }
    val idOnly = filtersAbove(child).filter(c =>
      c.deterministic && c.references.subsetOf(AttributeSet(idAttr)))
    val spark = SparkSession.active
    import org.apache.spark.sql.functions.col
    val base = spark.read.parquet(m.indexPath)
    val idxIdAttr = Bridge.expression(base.col(m.idCol))
      .asInstanceOf[AttributeReference]
    val transplanted = idOnly.map(_.transform {
      case a: AttributeReference if a.exprId == idAttr.exprId => idxIdAttr
    })
    val rank = graft.functions.vectors.cosineFast(
      graft.functions.vectors.dequantizeInt8(
        col(m.codesCol), col(m.scaleCol)),
      Bridge.column(qLit))
    val short = transplanted
      .foldLeft(base.filter(col(m.bucketCol).isin(probes: _*)))(
        (d, c) => d.filter(Bridge.column(c)))
      .orderBy(rank.desc, col(m.idCol))
      .limit(m.shortlist)
      .select(col(m.idCol))
    val shortPlan = short.queryExecution.analyzed
    val shortId = shortPlan.output.head
    val newChild = child.transformUp {
      case lr: LogicalRelation if lr eq rel =>
        Join(lr, shortPlan, LeftSemi,
          Some(EqualTo(idAttr, shortId)), JoinHint.NONE)
    }
    Some(s.copy(child = newChild))
  }

  private def rewriteSort(s: Sort, k: Int,
      metas: Seq[AnnIndex.Meta]): Option[Sort] = s match {
    case Sort(SortOrder(cos: CosineSim, Descending, _, _) +: _, true, child, _)
        if !lshPruned(child) =>
      val sides =
        (AnnTopKToLshPrune.queryLiteral(cos.left),
          AnnTopKToLshPrune.queryLiteral(cos.right)) match {
          case (None, Some(q)) => Some((cos.left, q))
          case (Some(q), None) => Some((cos.right, q))
          case _ => None
        }
      sides match {
        case Some((emb: AttributeReference, qLit)) =>
          metas.view.flatMap(m => serve(s, child, emb, qLit, k, m))
            .headOption
        case _ => None
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val metas = AnnIndex.all(conf)
    if (metas.isEmpty) return plan
    plan.transform {
      case gl @ GlobalLimit(IntegerLiteral(k), ll @ LocalLimit(_, s: Sort)) =>
        rewriteSort(s, k, metas)
          .map(ns => gl.copy(child = ll.copy(child = ns)))
          .getOrElse(gl)
      case gl @ GlobalLimit(IntegerLiteral(k),
          ll @ LocalLimit(_, p @ Project(_, s: Sort))) =>
        rewriteSort(s, k, metas)
          .map(ns => gl.copy(child = ll.copy(child = p.copy(child = ns))))
          .getOrElse(gl)
    }
  }
}
