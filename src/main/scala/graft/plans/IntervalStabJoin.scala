package graft.plans

import scala.collection.mutable

import org.apache.spark.Partitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.types._

/** Sort-based interval-stab join — a whole-operator replacement for the
  * BroadcastNestedLoopJoin Catalyst would otherwise plan for a bare
  * `p BETWEEN s AND e` inner-join predicate (the reference's sorted-index
  * interval probes, `src/utils/gene_database.py:10-24`, at relation scale).
  *
  * Physical shape (the IEJoin/interval-stab family, cf. DuckDB's IEJoin):
  *
  *   1. the POINT side is range-partitioned on the point key (bounds from
  *      [[RangePartitioner]]'s reservoir sample — one lightweight key-only
  *      pass);
  *   2. each INTERVAL replicates to exactly the partitions its [lo, hi]
  *      span overlaps (`getPartition(lo) .. getPartition(hi)` — the
  *      partitioner is monotonic, so this is the precise cover, no
  *      post-join dedup);
  *   3. per partition: points sort ascending, intervals sort by lo, and a
  *      single forward sweep maintains the active set (arrived: lo ≤ p;
  *      expired: hi < p) — every emitted row is a true match, so work is
  *      O(n log n + output), never O(|P|·|I|).
  *
  * Scale notes: both shuffles move each row once (intervals × their
  * partition-span cover, ~1 for spans below the partition width); the
  * active set holds only intervals overlapping the current point, so task
  * memory is the partition's rows — bounded by the range partitioning
  * exactly like a sort-merge join's. Mild skew is absorbed by the sampled
  * bounds the way `repartitionByRange` absorbs it, and a HOT point key —
  * the case no monotonic range partitioner can split — fans out over
  * dedicated sub-partitions with its covering intervals replicated
  * ([[SkewAwareRangePartitioner]]), so a 90%-on-one-key corpus cannot
  * create a straggler task.
  */
object IntervalStabJoinStrategy extends SparkStrategy with PredicateHelper
    with org.apache.spark.sql.catalyst.SQLConfHelper {

  /** One inequality conjunct read as "point OP bound": `point` references
    * one join side only, `bound` the other; `isLower` means `bound ≤/<
    * point`, else `point ≤/< bound`; `strict` = the open form.
    */
  private case class Ineq(
      point: Expression, bound: Expression, isLower: Boolean, strict: Boolean)

  private def integral(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | DateType => true
    case _ => false
  }

  /** All "point-vs-bound" readings of a single comparison conjunct. */
  private def readings(c: Expression): Seq[Ineq] = c match {
    case GreaterThanOrEqual(a, b) =>
      Seq(Ineq(a, b, isLower = true, strict = false),
          Ineq(b, a, isLower = false, strict = false))
    case LessThanOrEqual(a, b) =>
      Seq(Ineq(a, b, isLower = false, strict = false),
          Ineq(b, a, isLower = true, strict = false))
    case GreaterThan(a, b) =>
      Seq(Ineq(a, b, isLower = true, strict = true),
          Ineq(b, a, isLower = false, strict = true))
    case LessThan(a, b) =>
      Seq(Ineq(a, b, isLower = false, strict = true),
          Ineq(b, a, isLower = true, strict = true))
    case _ => Seq.empty
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    // deterministic only: the exec re-evaluates bound expressions (once to
    // route interval replicas, once in the sweep) — a nondeterministic
    // bound would disagree between the two evaluations
    case Join(left, right, Inner, Some(cond), _) if cond.deterministic =>
      val conjuncts = splitConjunctivePredicates(cond)
      def sideOf(e: Expression): Option[Boolean] =
        if (e.references.isEmpty) None
        else if (e.references.subsetOf(left.outputSet)) Some(true)
        else if (e.references.subsetOf(right.outputSet)) Some(false)
        else None
      // equality across the sides → Catalyst's hash joins are the right
      // plan; this strategy only claims PURE interval predicates
      val hasEqui = conjuncts.exists {
        case EqualTo(a, b) =>
          (for (sa <- sideOf(a); sb <- sideOf(b)) yield sa != sb).getOrElse(false)
        case _ => false
      }
      if (hasEqui) return Nil

      val candidates = for {
        lo <- conjuncts
        hi <- conjuncts
        if lo ne hi
        rl <- readings(lo) if rl.isLower
        rh <- readings(hi) if !rh.isLower
        if rl.point.semanticEquals(rh.point)
        if integral(rl.point.dataType) &&
           integral(rl.bound.dataType) && integral(rh.bound.dataType)
        pointSide <- sideOf(rl.point)
        loSide <- sideOf(rl.bound) if loSide != pointSide
        hiSide <- sideOf(rh.bound) if hiSide != pointSide
      } yield (lo, hi, rl, rh, pointSide)

      candidates.headOption match {
        case Some((loC, hiC, rl, rh, pointsOnLeft)) =>
          val extra = conjuncts.filterNot(c => (c eq loC) || (c eq hiC))
            .reduceOption(And)
          // variant selection mirrors Catalyst's broadcast-vs-shuffle join
          // choice: a dictionary-sized interval side broadcasts (zero
          // shuffles, no sampling job — the point side streams map-side);
          // a large one takes the range-partitioned sweep. The broadcast
          // build is a DRIVER-serial collect+sort, so it must also be
          // amortized by a much larger point side (measured at sf0.1:
          // 150k intervals vs 600k points — the collect costs more than
          // the sweep's two shuffles save), hence the asymmetry guard.
          val ivSide = if (pointsOnLeft) right else left
          val ptSide = if (pointsOnLeft) left else right
          val thr = conf.autoBroadcastJoinThreshold
          val ivSize = ivSide.stats.sizeInBytes
          if (thr > 0 && ivSize <= thr && ivSize * 16 <= ptSide.stats.sizeInBytes)
            BroadcastIntervalStabJoinExec(
              rl.point, rl.bound, rh.bound, rl.strict, rh.strict, extra,
              pointsOnLeft, planLater(left), planLater(right)) :: Nil
          else
            IntervalStabJoinExec(
              rl.point, rl.bound, rh.bound, rl.strict, rh.strict, extra,
              pointsOnLeft, planLater(left), planLater(right)) :: Nil
        case None => Nil
      }
    case _ => Nil
  }

  /** Idempotently install the strategy on `spark` (tried before Catalyst's
    * built-ins, so a matching join plans as [[IntervalStabJoinExec]]).
    */
  def register(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(this))
      exp.extraStrategies = exp.extraStrategies :+ this
  }
}

/** Broadcast interval-stab join: the interval side is collected, sorted by
  * `lo`, and broadcast with a prefix-max-`hi` array; each point binary
  * searches the last arrival (`lo ≤ p`) and walks DOWN emitting matches,
  * stopping as soon as `max(hi[0..i]) < p` — no interval at or below i can
  * cover p, so the walk touches only true matches plus one sentinel probe
  * (for overlap-bounded interval sets; nested pathological sets degrade
  * toward the arrival count, never past it).
  *
  * Zero shuffles and zero extra jobs on the point side — the exact analogue
  * of BroadcastHashJoin vs SortMergeJoin, chosen by
  * [[IntervalStabJoinStrategy]] from the interval side's size statistics.
  * This is also the reference's own shape at dictionary scale: a broadcast
  * sorted index probed per record (`src/utils/gene_database.py:10-24`).
  */
case class BroadcastIntervalStabJoinExec(
    point: Expression,
    lower: Expression,
    upper: Expression,
    lowerStrict: Boolean,
    upperStrict: Boolean,
    extraCond: Option[Expression],
    pointsOnLeft: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends SparkPlan
    with org.apache.spark.sql.execution.CodegenSupport {

  override def output: Seq[Attribute] = left.output ++ right.output
  override def children: Seq[SparkPlan] = Seq(left, right)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): SparkPlan =
    copy(left = newChildren(0), right = newChildren(1))

  private def toLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case other => throw new IllegalStateException(s"non-integral key: $other")
  }

  // same producer-style codegen as IntervalStabJoinExec: probed JoinedRows
  // feed the parent's generated consume, no flattening projection
  override def needCopyResult: Boolean = true
  // this exec is a DE-FACTO LEAF for codegen purposes — it produces the
  // stage's rows from its own RDD (inputRDDs), its children are never
  // codegen-consumed — so, exactly like Spark's InputAdapter, it is
  // entitled to emit the limit-not-reached checks in its producing loop.
  // Without this override, limitNotReachedCond sees children.nonEmpty and
  // logs a "[BUG] Only leaf nodes and blocking nodes..." contract WARN.
  override def canCheckLimitNotReached: Boolean = true
  override def inputRDDs(): Seq[RDD[InternalRow]] = Seq(probedRows())
  override protected def doProduce(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext): String = {
    val input = ctx.addMutableState("scala.collection.Iterator", "input",
      v => s"$v = inputs[0];")
    val row = ctx.freshName("row")
    s"""
       |while ($limitNotReachedCond $input.hasNext()) {
       |  InternalRow $row = (InternalRow) $input.next();
       |  ${consume(ctx, null, row).trim}
       |  ${if (needStopCheck) "if (shouldStop()) return;" else ""}
       |}
     """.stripMargin
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val outAttrs = output
    probedRows().mapPartitions { it =>
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      it.map(outProj)
    }
  }

  private def probedRows(): RDD[InternalRow] = {
    val (pointsPlan, ivPlan) =
      if (pointsOnLeft) (left, right) else (right, left)
    val boundPoint = BindReferences.bindReference(point, pointsPlan.output)
    val boundLo = BindReferences.bindReference(lower, ivPlan.output)
    val boundHi = BindReferences.bindReference(upper, ivPlan.output)

    // driver-side index build (size-gated by the strategy): sort by lo,
    // carry hi and the running max of hi for the early-stop walk
    val collected = ivPlan.executeCollect()
    val triples = collected.flatMap { r =>
      val lo = boundLo.eval(r)
      val hi = boundHi.eval(r)
      if (lo == null || hi == null) None
      else {
        val l = toLong(lo); val h = toLong(hi)
        if (h < l) None else Some((l, h, r))
      }
    }.sortBy(_._1)
    val nIv = triples.length
    val loArr = new Array[Long](nIv)
    val hiArr = new Array[Long](nIv)
    val maxHi = new Array[Long](nIv)
    val rowArr = new Array[InternalRow](nIv)
    var i = 0
    var runMax = Long.MinValue
    while (i < nIv) {
      loArr(i) = triples(i)._1
      hiArr(i) = triples(i)._2
      rowArr(i) = triples(i)._3
      runMax = math.max(runMax, hiArr(i))
      maxHi(i) = runMax
      i += 1
    }
    val bc = sparkContext.broadcast((loArr, hiArr, maxHi, rowArr))

    val loStrict = lowerStrict
    val hiStrict = upperStrict
    val ptsLeft = pointsOnLeft
    val outAttrs = output
    val extra = extraCond

    pointsPlan.execute().mapPartitions { it =>
      val (lo, hi, pmax, rows) = bc.value
      val n = lo.length
      val joined = new JoinedRow
      val pred = extra.map(e =>
        Predicate.create(BindReferences.bindReference(e, outAttrs)))

      val matches = it.flatMap { r =>
        val k = boundPoint.eval(r)
        if (k == null || n == 0) Iterator.empty
        else {
          val p = toLong(k)
          // last index with lo <= p (or lo < p when strict): binary search
          var a = 0; var b = n // invariant: lo(a-1) arrives, lo(b) doesn't
          while (a < b) {
            val m = (a + b) >>> 1
            val arrives = if (loStrict) lo(m) < p else lo(m) <= p
            if (arrives) a = m + 1 else b = m
          }
          var idx = a - 1
          val prow = r
          new Iterator[InternalRow] {
            private def alive(h: Long) = if (hiStrict) h > p else h >= p
            private def seek(): Unit = {
              while (idx >= 0 && alive(pmax(idx)) && !alive(hi(idx))) idx -= 1
              if (idx >= 0 && !alive(pmax(idx))) idx = -1
            }
            override def hasNext: Boolean = { seek(); idx >= 0 }
            override def next(): InternalRow = {
              seek()
              if (idx < 0) throw new NoSuchElementException
              val irow = rows(idx)
              idx -= 1
              if (ptsLeft) joined(prow, irow) else joined(irow, prow)
            }
          }
        }
      }
      pred match {
        case Some(p) => matches.filter(p.eval)
        case None => matches
      }
    }
  }
}

/** Physical interval-stab join; see [[IntervalStabJoinStrategy]] for the
  * algorithm. `pointsOnLeft` records which logical side carries the point
  * key — output column order stays `left ++ right` either way.
  *
  * Supports whole-stage codegen as a PRODUCER (the [[org.apache.spark.sql.execution.InputAdapter]]
  * shape, like SortMergeJoin): the swept [[JoinedRow]]s feed the parent's
  * generated consume directly, so a downstream partial aggregate reads
  * fields in place — no per-row flattening UnsafeProjection on the
  * (large) join output. The interpreted [[doExecute]] fallback keeps the
  * projection, because a non-codegen parent (collect, exchange) requires
  * UnsafeRow.
  */
case class IntervalStabJoinExec(
    point: Expression,
    lower: Expression,
    upper: Expression,
    lowerStrict: Boolean,
    upperStrict: Boolean,
    extraCond: Option[Expression],
    pointsOnLeft: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends SparkPlan
    with org.apache.spark.sql.execution.CodegenSupport {

  override def output: Seq[Attribute] = left.output ++ right.output
  override def children: Seq[SparkPlan] = Seq(left, right)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): SparkPlan =
    copy(left = newChildren(0), right = newChildren(1))

  // rows handed to consume are REUSED (one JoinedRow per partition over
  // array-held interval rows and the advancing point row) — buffering
  // parents must copy, exactly as with SortMergeJoin
  override def needCopyResult: Boolean = true

  // de-facto leaf for codegen (rows come from sweptRows(), children are
  // not codegen-consumed) — see the note on BroadcastIntervalStabJoinExec
  override def canCheckLimitNotReached: Boolean = true

  override def inputRDDs(): Seq[RDD[InternalRow]] = Seq(sweptRows())

  override protected def doProduce(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext): String = {
    val input = ctx.addMutableState("scala.collection.Iterator", "input",
      v => s"$v = inputs[0];")
    val row = ctx.freshName("row")
    s"""
       |while ($limitNotReachedCond $input.hasNext()) {
       |  InternalRow $row = (InternalRow) $input.next();
       |  ${consume(ctx, null, row).trim}
       |  ${if (needStopCheck) "if (shouldStop()) return;" else ""}
       |}
     """.stripMargin
  }

  /** partitionBy with Kryo instead of the RDD-default Java serialization —
    * UnsafeRow is KryoSerializable (raw byte copy), which roughly halves
    * per-row shuffle cost versus ObjectOutputStream.
    */
  private def shuffle[K: scala.reflect.ClassTag](
      rdd: RDD[(K, UnsafeRow)], p: Partitioner): RDD[(K, UnsafeRow)] =
    new org.apache.spark.rdd.ShuffledRDD[K, UnsafeRow, UnsafeRow](rdd, p)
      .setSerializer(new org.apache.spark.serializer.KryoSerializer(
        sparkContext.getConf))

  /** Whether map-side rows must be defensively copied before the shuffle —
    * `ShuffleExchangeExec.needToCopyObjectsBeforeShuffle`'s rule applied to
    * this RDD shuffle. With ≤ bypassMergeThreshold partitions the bypass
    * writer streams each record straight through the serializer; above it,
    * our Kryo serializer relocates serialized objects so the serialized
    * (Tungsten) writer is chosen and records are likewise serialized the
    * moment `write` receives them. In both regimes no writer retains a
    * deserialized reference, so the projection's reused buffer can be
    * handed over copy-free. Only the leftover regime — more partitions
    * than both thresholds, or a Kryo registrator that disabled autoReset —
    * buffers deserialized rows (SortShuffleWriter) and needs the copy.
    * The copy was ~60M allocations at the sf10 bracket: 25–40% of j1 wall
    * went to GC (r15 verdict watch item).
    */
  private def mustCopyBeforeShuffle(numParts: Int): Boolean =
    IntervalStabJoinExec.mustCopyBeforeShuffle(sparkContext.getConf, numParts,
      org.apache.spark.serializer.GraftSerializerBridge.sortShuffleManagerActive)

  private def toLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case other => throw new IllegalStateException(s"non-integral key: $other")
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val outAttrs = output
    sweptRows().mapPartitions { it =>
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      it.map(outProj)
    }
  }

  /** The swept join output as (reused) [[JoinedRow]]s, extra predicate
    * applied, BEFORE any flattening projection — shared by the codegen
    * produce path and the interpreted fallback.
    */
  private def sweptRows(): RDD[InternalRow] = {
    val (pointsPlan, ivPlan) =
      if (pointsOnLeft) (left, right) else (right, left)
    val numParts = math.max(1, conf.numShufflePartitions)

    val boundPoint = BindReferences.bindReference(point, pointsPlan.output)
    val boundLo = BindReferences.bindReference(lower, ivPlan.output)
    val boundHi = BindReferences.bindReference(upper, ivPlan.output)
    val ptsOutput = pointsPlan.output
    val ivOutput = ivPlan.output

    // the partitioner's reservoir sample only needs KEYS — sampling over
    // the full keyed RDD would pay a per-row UnsafeRow copy in a pass that
    // discards every row. The ONE sample supplies bounds AND hot-key
    // detection (skew hardening costs no extra job).
    val keysOnly: RDD[Long] =
      pointsPlan.execute().mapPartitions { it =>
        it.flatMap { r =>
          val k = boundPoint.eval(r)
          if (k == null) Iterator.empty else Iterator.single(toLong(k))
        }
      }
    // 256k default cap (was 1M): the sweep buffers one partition of points
    // per task, so resident bytes ≈ cap × concurrent tasks × row footprint.
    // At the sf10 bracket (60M points, 32-way local) the 1M cap buffered
    // ~3.5-4.5 GB across concurrent tasks and OOM'd a standalone 8 GB
    // heap; 256k holds ~1 GB resident with identical results — the grown
    // partition count (≈240 at sf10) just means smaller, safer tasks, and
    // past the bypass threshold the serialized Kryo writer keeps the map
    // side copy-free. Overridable per session for clusters with more
    // memory per core.
    val capRows = conf.getConfString(
      "spark.graft.stabJoin.maxRowsPerPartition", "262144").toLong
    // the rows cap can't see ROW WIDTH (r17 ADVICE sweep): 256k rows of
    // 40 B keys+ids is ~10 MB, but 256k rows dragging a document-sized
    // payload column through the join is gigabytes — a silent executor
    // OOM. The byte budget fails LOUD during buffering instead (same
    // contract as requireBounded on the dedup side); the message names
    // the fix (prune payload columns before the join, or raise the
    // budget on bigger executors).
    val capBytes = conf.getConfString(
      "spark.graft.stabJoin.maxBytesPerPartition", s"${256L << 20}").toLong
    val rp = SkewAwareRangePartitioner.fromKeys(keysOnly, numParts,
      maxRowsPerPartition = capRows)
    val n = math.max(1, rp.numPartitions)
    val idPart = new Partitioner {
      override def numPartitions: Int = n
      override def getPartition(key: Any): Int = key.asInstanceOf[Int]
    }

    // points carry their DESTINATION partition id: a hot key fans out over
    // its sub-partitions by row-content hash (deterministic — retry-safe),
    // so one hot point key can no longer form a straggler partition.
    // needCopy is almost always false (see mustCopyBeforeShuffle): the
    // shuffle writer serializes each record on receipt, so the
    // projection's reused buffer goes over copy-free.
    val needCopy = mustCopyBeforeShuffle(n)
    val ptsKeyed: RDD[(Int, UnsafeRow)] =
      pointsPlan.execute().mapPartitions { it =>
        val proj = UnsafeProjection.create(ptsOutput, ptsOutput)
        it.flatMap { r =>
          val k = boundPoint.eval(r)
          if (k == null) Iterator.empty
          else {
            val row0 = proj(r)
            val row = if (needCopy) row0.copy() else row0
            Iterator.single((rp.pointPartition(toLong(k), row.hashCode), row))
          }
        }
      }
    val ptsPart = shuffle(ptsKeyed, idPart)

    val ivKeyed: RDD[(Int, UnsafeRow)] = ivPlan.execute().mapPartitions { it =>
      val proj = UnsafeProjection.create(ivOutput, ivOutput)
      it.flatMap { r =>
        val lo = boundLo.eval(r)
        val hi = boundHi.eval(r)
        if (lo == null || hi == null) Iterator.empty
        else {
          val l = toLong(lo); val h = toLong(hi)
          if (h < l) Iterator.empty
          else {
            val row0 = proj(r)
            // the cover fan-out reuses ONE row across destinations; each
            // (p, row) pair is serialized before the next is pulled
            val row = if (needCopy) row0.copy() else row0
            rp.intervalCover(l, h).map(p => (p, row))
          }
        }
      }
    }
    val ivPart = shuffle(ivKeyed, idPart)

    val loStrict = lowerStrict
    val hiStrict = upperStrict
    val ptsLeft = pointsOnLeft
    val outAttrs = output
    val extra = extraCond

    ptsPart.zipPartitions(ivPart, preservesPartitioning = false) { (pit, iit) =>
      // keys re-evaluate off the rows (shuffle keys are partition ids now);
      // the strategy guards cond.deterministic, so both evaluations agree.
      // Both sides buffer as PRIMITIVE parallel arrays (long[] keys +
      // UnsafeRow[] rows) co-sorted in place: the previous
      // Array[(Long, UnsafeRow)].sortBy shape paid a Tuple2 + boxed Long
      // per row AND boxed every TimSort comparison — ~40 extra bytes/row
      // plus allocation churn that OOM'd an 8 GB local[32] heap at the
      // sf10 bracket (~1.9M buffered rows × 32 concurrent tasks). The
      // partitioner's rows-per-partition cap bounds these buffers; the
      // join output is order-insensitive among equal keys, so the
      // unstable in-place sort preserves the result set exactly.
      var bufBytes = 0L
      def tallyBytes(row: UnsafeRow): Unit = {
        bufBytes += row.getSizeInBytes
        if (bufBytes > capBytes) throw new IllegalStateException(
          s"stab-join sweep buffer exceeds $capBytes bytes in one task " +
            "(spark.graft.stabJoin.maxBytesPerPartition): the rows cap " +
            "bounds COUNT but these rows are wide — prune payload columns " +
            "before the join, or raise the budget on larger executors")
      }
      var pKeys = new Array[Long](1024)
      var pRows = new Array[UnsafeRow](1024)
      var pn = 0
      while (pit.hasNext) {
        val row = pit.next()._2
        if (pn == pKeys.length) {
          pKeys = java.util.Arrays.copyOf(pKeys, pn << 1)
          pRows = java.util.Arrays.copyOf(pRows, pn << 1)
        }
        tallyBytes(row)
        pKeys(pn) = toLong(boundPoint.eval(row)); pRows(pn) = row; pn += 1
      }
      var iLo = new Array[Long](1024)
      var iHi = new Array[Long](1024)
      var iRows = new Array[UnsafeRow](1024)
      var in = 0
      while (iit.hasNext) {
        val row = iit.next()._2
        if (in == iLo.length) {
          iLo = java.util.Arrays.copyOf(iLo, in << 1)
          iHi = java.util.Arrays.copyOf(iHi, in << 1)
          iRows = java.util.Arrays.copyOf(iRows, in << 1)
        }
        tallyBytes(row)
        iLo(in) = toLong(boundLo.eval(row)); iHi(in) = toLong(boundHi.eval(row))
        iRows(in) = row; in += 1
      }
      SweepSort.sort2(pKeys, pRows, pn)
      SweepSort.sort3(iLo, iHi, iRows, in)

      if (pn == 0 || in == 0) Iterator.empty
      else {
        val nPts = pn
        val nIvs = in
        val joined = new JoinedRow
        val pred = extra.map(e =>
          Predicate.create(BindReferences.bindReference(e, outAttrs)))

        val matches: Iterator[InternalRow] = new Iterator[InternalRow] {
          private var pi = 0          // current point
          private var ai = 0          // next interval to arrive
          private var ci = 0          // cursor into active for current point
          // active intervals as parallel grow-arrays (same no-boxing rule)
          private var activeHi = new Array[Long](64)
          private var activeRows = new Array[UnsafeRow](64)
          private var activeN = 0
          private var ready = false   // active prepared for pts(pi)

          private def arrives(lo: Long, p: Long): Boolean =
            if (loStrict) lo < p else lo <= p
          private def expired(hi: Long, p: Long): Boolean =
            if (hiStrict) hi <= p else hi < p

          private def prepare(): Unit = {
            while (!ready && pi < nPts) {
              val p = pKeys(pi)
              while (ai < nIvs && arrives(iLo(ai), p)) {
                if (activeN == activeHi.length) {
                  activeHi = java.util.Arrays.copyOf(activeHi, activeN << 1)
                  activeRows = java.util.Arrays.copyOf(activeRows, activeN << 1)
                }
                activeHi(activeN) = iHi(ai); activeRows(activeN) = iRows(ai)
                activeN += 1; ai += 1
              }
              var r = 0; var w = 0
              while (r < activeN) {
                if (!expired(activeHi(r), p)) {
                  activeHi(w) = activeHi(r); activeRows(w) = activeRows(r)
                  w += 1
                }
                r += 1
              }
              // release dropped row refs so expired intervals can GC
              var z = w
              while (z < activeN) { activeRows(z) = null; z += 1 }
              activeN = w
              if (w > 0) { ci = 0; ready = true }
              else pi += 1
            }
          }

          override def hasNext: Boolean = {
            if (!ready) prepare()
            while (ready && ci >= activeN) {
              ready = false; pi += 1; prepare()
            }
            ready && pi < nPts
          }

          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException
            val prow = pRows(pi)
            val irow = activeRows(ci)
            ci += 1
            if (ptsLeft) joined(prow, irow) else joined(irow, prow)
          }
        }

        pred match {
          case Some(p) => matches.filter(p.eval)
          case None => matches
        }
      }
    }
  }
}

/** In-place co-sorts over parallel primitive/ref arrays for the stab-join
  * sweep buffers — quicksort (median-of-three, insertion below 32) that
  * swaps the companion arrays alongside the long keys, so sorting N rows
  * allocates ZERO per-element objects. Unstable, which the sweep tolerates:
  * equal point keys see identical active sets and equal-lo intervals all
  * arrive before any point that admits them.
  */
object IntervalStabJoinExec {
  /** The copy decision, static so the regimes are unit-testable: copy only
    * when neither stream-through writer applies (see the instance method's
    * scaladoc for the writer-selection reasoning).
    *
    * `sortBasedShuffleOn` mirrors `needToCopyObjectsBeforeShuffle`'s first
    * branch (r16 ADVICE): every stream-through argument below is a property
    * of Spark's built-in `SortShuffleManager` writers. A pluggable manager
    * (`spark.shuffle.manager` → Celeborn, Uniffle, …) may buffer
    * DESERIALIZED records, so handing it the reused projection buffer
    * would silently corrupt join output — copy unconditionally there.
    */
  private[plans] def mustCopyBeforeShuffle(
      conf: org.apache.spark.SparkConf, numParts: Int,
      sortBasedShuffleOn: Boolean): Boolean = {
    if (!sortBasedShuffleOn) return true
    val bypass = conf.getInt("spark.shuffle.sort.bypassMergeThreshold", 200)
    if (numParts <= bypass) false
    else {
      val kryoRelocates = org.apache.spark.serializer.GraftSerializerBridge
        .supportsRelocation(
          new org.apache.spark.serializer.KryoSerializer(conf))
      // 2^24: SortShuffleManager.MAX_SHUFFLE_OUTPUT_PARTITIONS_FOR_SERIALIZED_MODE
      !(kryoRelocates && numParts <= (1 << 24))
    }
  }
}

private[plans] object SweepSort {

  def sort2(keys: Array[Long], rows: Array[UnsafeRow], n: Int): Unit =
    qsort(keys, rows, null, 0, n - 1)

  def sort3(lo: Array[Long], hi: Array[Long], rows: Array[UnsafeRow], n: Int): Unit =
    qsort(lo, rows, hi, 0, n - 1)

  // sorts keys[l..r]; rows swaps alongside; aux (the hi bounds) optionally too
  @annotation.tailrec
  private def qsort(keys: Array[Long], rows: Array[UnsafeRow],
      aux: Array[Long], l: Int, r: Int): Unit = {
    if (r - l < 32) {
      var i = l + 1
      while (i <= r) {
        val k = keys(i); val rw = rows(i)
        val a = if (aux != null) aux(i) else 0L
        var j = i - 1
        while (j >= l && keys(j) > k) {
          keys(j + 1) = keys(j); rows(j + 1) = rows(j)
          if (aux != null) aux(j + 1) = aux(j)
          j -= 1
        }
        keys(j + 1) = k; rows(j + 1) = rw
        if (aux != null) aux(j + 1) = a
        i += 1
      }
    } else {
      val m = l + ((r - l) >>> 1)
      // median-of-three pivot to keep sorted/reverse inputs O(n log n)
      val pivot = {
        val a = keys(l); val b = keys(m); val c = keys(r)
        if (a < b) { if (b < c) b else if (a < c) c else a }
        else { if (a < c) a else if (b < c) c else b }
      }
      var i = l; var j = r
      while (i <= j) {
        while (keys(i) < pivot) i += 1
        while (keys(j) > pivot) j -= 1
        if (i <= j) {
          val tk = keys(i); keys(i) = keys(j); keys(j) = tk
          val tr = rows(i); rows(i) = rows(j); rows(j) = tr
          if (aux != null) { val ta = aux(i); aux(i) = aux(j); aux(j) = ta }
          i += 1; j -= 1
        }
      }
      // recurse into the smaller half, iterate the larger (stack-safe)
      if (j - l < r - i) {
        if (l < j) qsortCall(keys, rows, aux, l, j)
        qsort(keys, rows, aux, i, r)
      } else {
        if (i < r) qsortCall(keys, rows, aux, i, r)
        qsort(keys, rows, aux, l, j)
      }
    }
  }

  // non-tailrec trampoline for the smaller half
  private def qsortCall(keys: Array[Long], rows: Array[UnsafeRow],
      aux: Array[Long], l: Int, r: Int): Unit =
    qsort(keys, rows, aux, l, r)
}
