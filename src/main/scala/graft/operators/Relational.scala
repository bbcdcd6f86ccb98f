package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General relational building blocks used by the query surface:
  * top-k per group, as-of joins, gap-based sessionization. All are
  * single-shuffle window/join plans designed to survive scale-up —
  * no driver-side collection, no cartesian products.
  */
object Relational {

  /** Exact-sum helper for oracle-parity aggregation: accumulate in
    * DECIMAL (associative & exact, so partial/final aggregation order
    * can't change the result) and surface as double. The DuckDB
    * mirror is CAST(SUM(CAST(x AS DECIMAL(20,4))) AS DOUBLE). */
  def exactSum(c: Column): Column =
    sum(c.cast("decimal(20,4)")).cast("double")

  /** Mean via exact sum / count — deterministic under any partitioning
    * (a plain avg(double) is order-sensitive in the last ulp). */
  def exactAvg(c: Column): Column =
    exactSum(c) / count(lit(1))

  /** Top-k rows per group by `order` (must be a total order — append a
    * unique tie-break column). One shuffle on the group key; rank
    * filter happens streamingly inside the window operator. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column],
      orderCols: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols: _*).orderBy(orderCols: _*)
    df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** As-of join: for each left row, attach the latest right value
    * (`rightValCol`, surfaced as `outCol`) with the same key and
    * rightTs <= leftTs; null when no such right row exists.
    *
    * Implemented as the union + last(ignoreNulls) window trick — one
    * shuffle on the key, a per-key sort, no range explosion: the
    * classic way to do 100 TB-scale point-in-time joins without an
    * interval join or a per-row subquery.
    *
    * Ordering within equal timestamps: right rows sort BEFORE left
    * rows at the same ts (side 0 < side 1), i.e. a right row at
    * exactly leftTs is visible to that left row — the `rightTs <=
    * leftTs` ASOF semantics, matching DuckDB's ASOF JOIN. When
    * SEVERAL right rows share (key, ts), the LARGEST value wins —
    * an explicit total order, so the result cannot depend on
    * partitioning (a bare last() would pick a shuffle-order row).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      rightValCol: String, outCol: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
    val r = right.select(
      col(key), col(rightTs).as("_ts"), lit(0).as("_side"),
      col(rightValCol).as(outCol))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // third sort key = the value itself: among right rows tied on ts,
    // last(ignoreNulls) then deterministically takes the maximum
    val w = Window.partitionBy(col(key))
      .orderBy(col("_ts"), col("_side"), col(outCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn(outCol, last(col(outCol), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select((leftCols :+ outCol).map(col): _*)
  }

  /** Native sort-merge as-of join — [[asOfJoin]]'s contract on
    * null-free inputs (greatest rightTs <= leftTs per key; time ties
    * → max value; no match → null) planned as the custom
    * whole-operator AsOfJoinPlan/AsOfJoinExec (extension-ladder rung
    * c): one co-partitioned exchange per side, per-partition sorts, a
    * single merge pass with one candidate row of state — instead of
    * the composed union + unbounded window frame. On NULLS the two
    * deliberately differ: this operator follows SQL/DuckDB ASOF
    * semantics (null keys and null times match nothing; a null right
    * value stays null), while the composed window form's
    * last(ignoreNulls) can attach a value from a null-ts right row
    * and skips null right values. RelationalSpec asserts null-free
    * parity, the null semantics, and pins the physical shape.
    * Requires the strategy to be registered
    * (graft.plans.GraftExtensions via config or `register`). */
  def asOfJoinNative(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      rightValCol: String, outCol: String,
      direction: String = "backward", tolerance: Long = -1L): DataFrame =
    org.apache.spark.sql.graft.AsOf.join(
      left, right, key, leftTs, rightTs, rightValCol, outCol,
      direction, tolerance)

  /** Exact count-distinct with value-salting for skewed keys: phase 1
    * groups by (key, hash(value) % salt) and counts distinct within
    * each salt cell; phase 2 sums the cells. Every distinct value
    * lands in exactly one cell, so the sum is EXACT — but no single
    * reducer ever holds a hot key's full distinct set, which is what
    * OOMs a plain countDistinct at 100 TB when one key dominates.
    * (SURVEY §7.5.7 — salting for skew.) */
  def saltedCountDistinct(df: DataFrame, keyCols: Seq[Column],
      valueCol: Column, salt: Int, outCol: String): DataFrame = {
    val cell = pmod(xxhash64(valueCol), lit(salt))
    df.groupBy(keyCols :+ cell.as("_salt"): _*)
      .agg(countDistinct(valueCol).as("_partial"))
      .groupBy(keyCols: _*)
      .agg(sum(col("_partial")).as(outCol))
  }

  /** Skew-safe inner equi-join by hot-key salting: the classic 100 TB
    * pattern for a join whose key distribution has a heavy head (one
    * user / one order / one empty-string key holding a double-digit
    * percentage of the fact rows, which a plain shuffle join sends to
    * ONE reducer). Fact rows on a hot key get a deterministic salt in
    * [0, salt) from a per-row unique id; the dim side replicates its
    * hot-key rows `salt` ways; the join key becomes (key, salt-cell),
    * so the hot key's rows spread over `salt` reducers. Non-hot keys
    * pay nothing (salt cell 0, one dim replica). The result is
    * EXACTLY the plain inner join: every fact row still meets every
    * matching dim row exactly once, because its salt cell names
    * exactly one of the `salt` replicas.
    *
    * `hotKeys` is a planning statistic: in production derive it from
    * a frequency sketch or a sampled groupBy (like the documented IVF
    * / LSH sizing statistics), or lean on AQE's skew-join splitting
    * when a sort-merge join is already in play — this operator is for
    * when you know the head keys and want the spread guaranteed at
    * plan time. Column names must be disjoint across the two inputs
    * (standard for the fact/dim schemas this targets).
    *
    * Broadcast note: if the dim side is small enough to broadcast,
    * Catalyst will still broadcast here (the salt rides along
    * harmlessly); salting only changes the plan that matters — the
    * shuffled one where broadcast is impossible. */
  def skewedJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, factId: Column,
      hotKeys: Seq[Any], salt: Int): DataFrame = {
    require(salt >= 2, s"salt must be >= 2, got $salt")
    require(hotKeys.nonEmpty, "hotKeys must be non-empty")
    // _gsalt is a reserved working column: withColumn would silently
    // REPLACE a caller column of that name and the final select would
    // re-emit salt cells in its place (silent data corruption)
    require(!fact.columns.contains("_gsalt") && !dim.columns.contains("_gsalt"),
      "skewedJoin reserves the working column name _gsalt; rename the input column")
    val fSalt = when(col(factKey).isin(hotKeys: _*),
      pmod(xxhash64(factId), lit(salt.toLong)).cast("int"))
      .otherwise(lit(0))
    val dReps = when(col(dimKey).isin(hotKeys: _*),
      sequence(lit(0), lit(salt - 1))).otherwise(array(lit(0)))
    val f = fact.withColumn("_gsalt", fSalt).alias("gf")
    val d = dim.withColumn("_gsalt", explode(dReps)).alias("gd")
    f.join(d,
      col(s"gf.$factKey") === col(s"gd.$dimKey") &&
        col("gf._gsalt") === col("gd._gsalt"))
      .select(fact.columns.map(c => col(s"gf.$c")).toSeq ++
        dim.columns.map(c => col(s"gd.$c")): _*)
  }

  /** Interval (point-in-range) join via bucket expansion: attach to
    * each point row every interval row with `startCol <= pointCol <=
    * endCol` (inclusive bounds, numeric columns — convert timestamps
    * with unix_millis first). A naive non-equi join plans as a
    * nested-loop/cartesian — quadratic and undistributable at scale.
    * This instead quantizes the axis into `bucketWidth`-sized cells:
    * each interval replicates to the cells it covers, each point maps
    * to its one cell, the join becomes an EQUI-join on the cell id
    * (hash-partitionable like any other), and the exact range
    * predicate re-filters the per-cell candidates. Each (point,
    * interval) match meets in exactly one cell — the point's — so no
    * dedup pass is needed and the result is exactly the theta-join.
    *
    * Replication factor is len(interval)/bucketWidth + 1, so pick
    * bucketWidth near the median interval length: cost is
    * O(points + Σ cells-per-interval + candidate pairs sharing a
    * cell), the standard scale form of an interval join (Flink's
    * interval join and range-join optimizers do the same expansion).
    * Column names must be disjoint across the two inputs. */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    // same reserved-name hazard as skewedJoin's _gsalt
    require(!points.columns.contains("_gcell") &&
      !intervals.columns.contains("_gcell"),
      "rangeJoin reserves the working column name _gcell; rename the input column")
    // exact floor-division bucket id in INTEGRAL arithmetic
    // (IntegralDivide, i.e. SQL `div`) — Column./ on longs is double
    // division, whose long→double cast loses low bits above 2^53 and
    // can bucket a point one cell away from its interval (silently
    // dropping the match: the re-filter only removes false
    // POSITIVES). Raw nanosecond epochs (~1.7e18) sit squarely in
    // that range. Subtracting pmod first makes the quotient exact and
    // keeps floor semantics for negative axis values.
    def cell(c: Column): Column = {
      import org.apache.spark.sql.graft.Bridge
      import org.apache.spark.sql.catalyst.expressions.IntegralDivide
      Bridge.column(IntegralDivide(
        Bridge.expression(c - pmod(c, lit(bucketWidth))),
        Bridge.expression(lit(bucketWidth))))
    }
    val p = points.withColumn("_gcell", cell(col(pointCol)))
    val i = intervals.withColumn("_gcell",
      explode(sequence(cell(col(startCol)), cell(col(endCol)))))
    p.join(i, Seq("_gcell"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_gcell")
  }

  /** Scan-width policy for heavy per-row CPU: one hot parquet file
    * plans ONE scan split, so a scan-time expression costing whole
    * CPU-seconds per partition runs near-serially no matter how many
    * cores the session has (q69's trigram kernel: ~9 cpu-s on a
    * 1-split documents scan = 4 s wall on 32 cores). When the
    * upstream plan has fewer partitions than the session width,
    * round-robin repartition to full width BEFORE the expensive
    * projection; when the scan is already wide — the 100 TB case,
    * thousands of files — this is a structural no-op (the partition
    * count check keeps the exchange out of the plan entirely). The
    * widening shuffle moves only the raw input columns, the price of
    * turning a serial scan full-width — same convention as the
    * q92/q102 codec kernels' repartition-ids-before-decode. Policy,
    * not luck: call this at every seam where a scan feeds a heavy
    * kernel, and let the check decide.
    *
    * Pass a unique-ish `key` when the input has one (doc/vec ids):
    * hash distribution is deterministic per row, so it skips the
    * whole-row local sort Spark prepends to ROUND-ROBIN exchanges for
    * retry determinism (spark.sql.execution.sortBeforeRepartition) —
    * on wide text rows recomputed across join branches that sort
    * measured 5× the kernel's own CPU (q30: 11 → 65 cpu-s). Keyless
    * inputs fall back to round-robin and pay it knowingly. */
  def widenForCpu(df: DataFrame, key: Column*): DataFrame = {
    // streaming frames can't be partition-counted (and micro-batches
    // are width-planned by the engine): pass through untouched
    if (df.isStreaming) return df
    // an input whose plan already shuffles (aggregate/join/window/…)
    // has spark.sql.shuffle.partitions-governed width — treat as wide
    // WITHOUT physically planning it: the .rdd width probe below
    // re-plans the input subtree, which is milliseconds for a narrow
    // scan chain but whole SECONDS of driver CPU for the big composed
    // prep pipelines (measured: q66 3.4 s → 10.8 s when this probe ran
    // on its derived dedup inputs). The one-hot-file hazard this
    // policy exists for lives below the first shuffle by definition.
    import org.apache.spark.sql.catalyst.plans.{logical => L}
    val shuffled = df.queryExecution.analyzed.exists {
      case _: L.Aggregate | _: L.Join | _: L.Sort | _: L.Window |
          _: L.Distinct | _: L.Deduplicate | _: L.RepartitionOperation |
          _: L.GlobalLimit | _: L.Except | _: L.Intersect => true
      case _ => false
    }
    if (shuffled) return df
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= cores) df
    else if (key.nonEmpty) df.repartition(cores, key: _*)
    else df.repartition(cores)
  }

  /** Gap-based sessionization: a new session starts when the gap to
    * the previous event of the same key exceeds `gapSeconds`. Returns
    * the input plus a `session_id` (0-based per key). One shuffle. */
  def sessionize(df: DataFrame, keyCol: Column, tsCol: Column,
      gapSeconds: Long, tieBreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsCol +: tieBreak: _*)
    val prevTs = lag(tsCol, 1).over(w)
    val isNew = when(prevTs.isNull, 1L)
      .when(unix_millis(tsCol) - unix_millis(prevTs) > gapSeconds * 1000L, 1L)
      .otherwise(0L)
    df.withColumn("_new_session", isNew)
      .withColumn("session_id",
        sum(col("_new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
      .drop("_new_session")
  }

  /** Deterministic stratified sampling — the domain-mixing step of
    * training-corpus prep: each stratum (e.g. source) keeps its
    * configured fraction of rows, decided per row by a content hash,
    * not a RNG. Reproducible across runs/partitionings/engines (the
    * oracle applies the identical md5 arithmetic), zero shuffle, and
    * at 100 TB the sample is a pure scan-time filter. `idCol` must be
    * unique per row; rates are in [0, 1] with 3-decimal resolution
    * (the keep test is hash mod 1000 < rate·1000). Strata absent from
    * `rates` keep everything (rate 1.0). */
  def stratifiedSample(df: DataFrame, stratumCol: Column, idCol: Column,
      rates: Map[String, Double], saltPrefix: String = "samp-"): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0),
      s"sampling rates must be in [0,1]: $rates")
    val rate = rates.foldLeft(lit(1.0)) { case (els, (k, r)) =>
      when(stratumCol === k, lit(r)).otherwise(els)
    }
    val h = graft.functions.hashes.md5Hash60(
      concat(lit(saltPrefix), idCol.cast("string")))
    df.filter(pmod(h, lit(1000L)) < (rate * 1000.0).cast("long"))
  }

  /** TEMPERATURE-scaled source-mixing cuts (α = 1/2): allocate a
    * corpus-wide token `budget` across sources with weight ∝ √tokens —
    * the standard down-weighting of giant crawl sources relative to
    * small curated ones (α = 1 is proportional mixing, α = 0 uniform;
    * 1/2 is the square-root temperature used throughout multilingual /
    * multi-source training mixes). Returns, per source, the per-mille
    * hash cut that [[temperatureMix]] applies.
    *
    * EXACTNESS BY CONSTRUCTION: the whole computation is integer-only.
    * The weight is floor(√n) — IEEE sqrt is correctly rounded and
    * floor is exact, so the BIGINT weight is bit-identical in any
    * engine — and the cut is one BigInt expression
    * min(1000, ⌊1000·budget·w_s / (Σw · n_s)⌋), so a SQL oracle
    * (HUGEINT `//`) reproduces every cut exactly: no pow(), no
    * rounding-boundary risk. Production α ≠ {0, ½, 1} needs pow() —
    * apply the q113 rounded-decimal convention there.
    *
    * Scale shape: ONE aggregate over the corpus (per-source token
    * sums; map-side combine collapses each partition to its ≤|sources|
    * rows), then driver arithmetic on a |sources|-row array — the
    * documented bounded planning-lookup convention (q67/q108/q113).
    * The corpus itself never shuffles. */
  def temperatureMixCuts(docs: DataFrame, stratumCol: String,
      textCol: String, budgetTokens: Long,
      maxStrata: Int = 1024): Seq[(String, Long)] =
    temperatureMilli(docs, stratumCol, textCol, budgetTokens,
      maxStrata).map { case (s, e) => (s, e.min(1000L)) }

  /** NS MIXING, the UP-SAMPLING half: per-stratum target EPOCHS in
    * milli-units from the same √n temperature weights as
    * [[temperatureMixCuts]] but WITHOUT the 1000 clamp — rare
    * strata get e_milli > 1000, i.e. every doc repeats
    * e_milli div 1000 times plus one more with probability
    * (e_milli mod 1000)/1000, which is exactly the fractional-epoch
    * contract of LLM data recipes ("epochs per source"); strata at
    * e_milli < 1000 degrade to the q124 selection semantics (0 base
    * copies + fractional selection ≡ temperatureMix). `maxEpochs`
    * fails loudly when the budget/corpus ratio would explode the
    * materialization (an upsample factor is a deliberate recipe
    * choice, never an accident of a tiny stratum). */
  def epochMixMilli(docs: DataFrame, stratumCol: String,
      textCol: String, budgetTokens: Long, maxStrata: Int = 1024,
      maxEpochs: Int = 100): Seq[(String, Long)] = {
    val es = temperatureMilli(docs, stratumCol, textCol, budgetTokens,
      maxStrata)
    es.foreach { case (s, e) =>
      require(e <= maxEpochs * 1000L,
        s"epochMixMilli: stratum '$s' allocates ${e / 1000.0} epochs " +
          s"> maxEpochs=$maxEpochs — raise the cap deliberately or " +
          "lower the budget")
    }
    es
  }

  /** Materialize an epoch allocation from [[epochMixMilli]]: one
    * output row per (doc, epoch) with a 0-based `epoch` index and
    * the doc's `epoch_milli` — the training-mixture manifest a data
    * loader consumes. The fractional copy is selected by the SAME
    * salted 60-bit hash family as [[temperatureMix]], so the
    * materialization is deterministic, engine-mirrorable, and a
    * stratum below 1000 milli reproduces temperatureMix's kept set
    * exactly (base 0 + fractional selection). Pure scan-time
    * arithmetic — the only data growth is the requested repetition,
    * and there is NO shuffle: replication happens in the scan
    * projection (explode over a per-row integer sequence). */
  /** ONE rendering of the 10-way test/val/train fold over a hash
    * residue — shared by every fold consumer (groupAwareSplit, the
    * fold-at-ingest sink, q194/q208/q209, the refold verb) so the
    * fold arithmetic cannot drift between surfaces; the DuckDB
    * oracles mirror it as the literal CASE. */
  def foldOf(h: Column): Column = when(h === 0, "test")
    .when(h === 1, "val").otherwise("train")

  /** GROUP-AWARE TRAIN/VAL/TEST SPLIT — assign each GROUP (not each
    * document) to a fold by a deterministic hash of the group key,
    * so documents sharing a key (canonical URL, near-dup cluster id,
    * book/source id) can never straddle train and eval: the
    * GroupShuffleSplit recipe. q121 MEASURES the leakage a naive
    * split leaves behind; this PREVENTS the whole within-group class
    * of it by construction. Fold arithmetic is the q65 deterministic
    * hash convention (md5-60 mod 10: 0 = test, 1 = val, rest train —
    * reproducible across engines and partitionings, no RNG).
    *
    * Per-(source, fold) report: docs, distinct groups, and
    * `n_rescued` — how many docs a DOC-level hash split would have
    * placed in a DIFFERENT fold than their group, i.e. exactly the
    * docs the group policy pulled back from the leakage boundary.
    * One hash shuffle for the aggregate (distinct groups need the
    * group key co-located); bodies never move — the projection is
    * (source, fold, key) wide. */
  def groupAwareSplit(docs: DataFrame, idCol: String,
      sourceCol: String, groupKey: Column): DataFrame = {
    import graft.functions.hashes
    docs.select(col(sourceCol).as("source"),
        foldOf(hashes.md5Hash60(groupKey) % 10).as("split"),
        groupKey.as("_grp"),
        foldOf(hashes.md5Hash60(col(idCol).cast("string")) % 10)
          .as("_dsplit"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("_grp")).as("n_groups"),
        sum(when(col("_dsplit") =!= col("split"), 1L).otherwise(0L))
          .as("n_rescued"))
  }

  def epochUpsample(df: DataFrame, stratumCol: Column, idCol: Column,
      epochs: Seq[(String, Long)],
      saltPrefix: String = "epoch-"): DataFrame = {
    // per-stratum literals: base copies and the fractional milli part
    // fold into two integer CASE chains — no division in the plan
    val eMilli = epochs.foldLeft(lit(0L)) { case (els, (k, e)) =>
      when(stratumCol === k, lit(e)).otherwise(els)
    }
    val base = epochs.foldLeft(lit(0L)) { case (els, (k, e)) =>
      when(stratumCol === k, lit(e / 1000L)).otherwise(els)
    }
    val fracMilli = epochs.foldLeft(lit(0L)) { case (els, (k, e)) =>
      when(stratumCol === k, lit(e % 1000L)).otherwise(els)
    }
    val h = graft.functions.hashes.md5Hash60(
      concat(lit(saltPrefix), idCol.cast("string")))
    val copies = base +
      when(pmod(h, lit(1000L)) < fracMilli, 1L).otherwise(0L)
    df.withColumn("epoch_milli", eMilli)
      .withColumn("n_copies", copies)
      .filter(col("n_copies") > 0L)
      .withColumn("epoch",
        explode(sequence(lit(0L), col("n_copies") - 1)))
  }

  /** [[temperatureMixCuts]] over a PRECOMPUTED per-doc token-count
    * column instead of the text — the store-backed report form
    * (trainingPrepReport): token counts were decided once at ingest
    * and sealed, so the cut derivation must not re-tokenize.
    * Identical arithmetic (sum of stored counts ≡ sum of
    * size(tokens(text)) when the stored count IS that size). */
  def temperatureMixCutsFromCounts(docs: DataFrame,
      stratumCol: String, countCol: String, budgetTokens: Long,
      maxStrata: Int = 1024): Seq[(String, Long)] =
    temperatureMilliAgg(docs, stratumCol,
      col(countCol).cast("long"), budgetTokens, maxStrata)
      .map { case (s, e) => (s, e.min(1000L)) }

  /** Shared allocation core of [[temperatureMixCuts]] (clamped) and
    * [[epochMixMilli]] (unclamped): per-stratum milli-allocation
    * 1000·budget·⌊√n_s⌋ / (Σ⌊√n⌋ · n_s), exact BigInt integer
    * arithmetic over the bounded per-stratum token totals. */
  private def temperatureMilli(docs: DataFrame, stratumCol: String,
      textCol: String, budgetTokens: Long,
      maxStrata: Int): Seq[(String, Long)] =
    temperatureMilliAgg(docs, stratumCol,
      size(graft.functions.text.tokens(col(textCol))).cast("long"),
      budgetTokens, maxStrata)

  private def temperatureMilliAgg(docs: DataFrame, stratumCol: String,
      perDocTokens: Column, budgetTokens: Long,
      maxStrata: Int): Seq[(String, Long)] = {
    require(budgetTokens >= 0, s"budget must be >= 0: $budgetTokens")
    // cardinality gate BEFORE the per-stratum collect (labelCoherence
    // convention): source-grain strata are O(10), but a caller passing
    // a high-cardinality column (an id by mistake) must fail loudly
    // without materializing it on the driver. Driver-SAFE, not cheap:
    // in the very failure case it guards against, the distinct still
    // shuffles full corpus cardinality before the limit applies — the
    // cost it removes is the unbounded driver collect, not the shuffle
    val nStrata = docs.select(col(stratumCol)).filter(
      col(stratumCol).isNotNull).distinct().limit(maxStrata + 1).count()
    require(nStrata <= maxStrata,
      s"temperatureMixCuts: distinct strata exceed maxStrata=" +
        s"$maxStrata — the per-stratum collect would not be bounded; " +
        "raise the cap or pre-bucket (is the stratum column an id?)")
    // a NULL stratum is excluded from the allocation entirely (its
    // docs get cut 0 in temperatureMix's fold) — including it here
    // would put its tokens in the denominator while its docs can
    // never be selected, silently under-filling the budget
    val per = docs.filter(col(stratumCol).isNotNull)
      .groupBy(col(stratumCol))
      .agg(coalesce(sum(perDocTokens), lit(0L)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    val weights = per.map { case (s, n) =>
      (s, n, BigInt(math.sqrt(n.toDouble).toLong))
    }
    val denom = weights.map(_._3).sum
    weights.map { case (s, n, w) =>
      val alloc =
        if (denom == 0 || n == 0L) BigInt(0)
        else (BigInt(1000) * BigInt(budgetTokens) * w) /
          (denom * BigInt(n))
      // saturate instead of Long-wrapping on absurd budget/corpus
      // ratios — epochMixMilli's maxEpochs guard then fails loudly
      (s, alloc.min(BigInt(Long.MaxValue)).toLong)
    }.toSeq
  }

  /** Apply [[temperatureMixCuts]]: keep a document iff its salted
    * 60-bit hash lands under its source's per-mille cut — the same
    * deterministic, engine-mirrorable selection as
    * [[stratifiedSample]], with the rate derived from the corpus
    * instead of passed in. Pure scan-time filter, zero shuffle. */
  def temperatureMix(df: DataFrame, stratumCol: Column, idCol: Column,
      cuts: Seq[(String, Long)],
      saltPrefix: String = "mix-"): DataFrame = {
    val cut = cuts.foldLeft(lit(0L)) { case (els, (k, c)) =>
      when(stratumCol === k, lit(c)).otherwise(els)
    }
    val h = graft.functions.hashes.md5Hash60(
      concat(lit(saltPrefix), idCol.cast("string")))
    df.withColumn("mix_cut", cut)
      .filter(pmod(h, lit(1000L)) < col("mix_cut"))
  }
}
