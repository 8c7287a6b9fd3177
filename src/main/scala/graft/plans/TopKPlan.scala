package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  AttributeReference, AttributeSet, Descending, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator,
  CodegenContext, ExprCode, GenerateOrdering}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.{BlockingOperatorWithCodegen,
  CodegenSupport, SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.IntegerType

/** Serializable recipe for per-partition top-k state. Shipped into generated
  * code via `CodegenContext.addReferenceObj` (so it rides the broadcast
  * plan, once per query) and materialized into a fresh [[TopKHeapBuffer]]
  * once per task via [[create]]. Top-level (not nested in [[TopKPlan]])
  * because Janino resolves it by source name in the generated class. */
final case class TopKBufferFactory(
    grouping: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    inputSchema: Seq[Attribute],
    rankedOutput: Option[Seq[Attribute]] = None) extends Serializable {
  def create(): TopKHeapBuffer = {
    val keyProj = UnsafeProjection.create(grouping, inputSchema)
    val rowOrd = GenerateOrdering.generate(ordering, inputSchema)
      .asInstanceOf[Ordering[InternalRow]]
    val rankedProj = rankedOutput
      .map(out => UnsafeProjection.create(out, out)).orNull
    new TopKHeapBuffer(keyProj, rowOrd, k, rankedProj)
  }
}

/** Executor-side hash-of-bounded-heaps behind an `insert`/`result` surface —
  * the codegen twin of `TopKPlan.prunePartition`. `insert` COPIES the
  * incoming row: the generated caller hands it a reused `UnsafeProjection`
  * output buffer, and `TopKPartialExec.needCopyResult = false` downstream
  * assumes every retained row is a private copy. Memory is
  * O(keys-in-partition × k) rows, the partial-hash-aggregate bound. */
final class TopKHeapBuffer(
    keyProj: UnsafeProjection,
    rowOrd: Ordering[InternalRow],
    k: Int,
    rankedProj: UnsafeProjection = null) {
  private val heaps = scala.collection.mutable.HashMap
    .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]

  def insert(row: UnsafeRow): Unit = {
    val key = keyProj(row)
    var heap = heaps.getOrElse(key, null)
    if (heap == null) {
      heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](rowOrd)
      heaps(key.copy()) = heap
    }
    if (heap.size < k) heap.enqueue(row.copy())
    else if (rowOrd.compare(row, heap.head) < 0) {
      heap.dequeue(); heap.enqueue(row.copy())
    }
  }

  /** Survivors across all keys, unranked/unsorted (shuffle-input shape —
    * [[TopKPlan.TopKFinalExec]] re-prunes and sorts post-exchange). */
  def result(): Iterator[UnsafeRow] =
    heaps.valuesIterator.flatMap(_.iterator.map(_.asInstanceOf[UnsafeRow]))

  /** Survivors sorted best-first per key with a 1-based rank appended
    * (final-operator output shape). The projection's output buffer is
    * reused row-to-row — consumers that buffer must copy, hence
    * `TopKFinalExec.needCopyResult = true`. */
  def resultRanked(): Iterator[UnsafeRow] = {
    require(rankedProj != null, "buffer was not built for ranked output")
    val rankRow = new GenericInternalRow(1)
    val joined = new JoinedRow
    heaps.valuesIterator.flatMap { heap =>
      val buf = scala.collection.mutable.ArrayBuffer.from[InternalRow](heap)
      buf.sortInPlace()(rowOrd)
      buf.iterator.zipWithIndex.map { case (row, i) =>
        rankRow.setInt(0, i + 1)
        rankedProj(joined(row, rankRow))
      }
    }
  }
}

/** Whole-operator top-k-per-group as a custom plan — preference tier (c)
  * (SURVEY.md §4): logical node + planner strategy + two physical operators,
  * installable via [[GraftExtensions]] or `spark.experimental.extraStrategies`.
  *
  * Why an operator and not the `row_number()` window: Spark's rank-filter
  * plan (measured, sf0.001–0.1) is `Sort → WindowGroupLimit(partial) →
  * Exchange → Sort → WindowGroupLimit → Window` — the shuffle is already
  * pruned to ≤ k rows per key per partition, but the map side pays a FULL
  * O(n log n) sort of every input partition first, with sort-buffer memory
  * and spill to match. [[TopKPartialExec]] replaces both sorts with
  * bounded heaps: O(n log k) map-side scan whose memory is k rows per
  * live key, never spill-prone sort buffers — the part that matters when
  * an input partition is gigabytes. Same partial/final split as a hash
  * aggregate, applied to an order statistic. (At local bench scale the
  * codegen'd sort and the heap time out the same — the win is the memory
  * bound, not small-data CPU.)
  *
  * Ordering must be a total order (add a tie-break column) for
  * deterministic, oracle-comparable output. Memory per task is
  * O(keys-in-partition × k) rows — the same bound as a partial hash
  * aggregate's map; beyond-memory key cardinality would need the usual
  * sort-based fallback, which partial aggregation also falls back to.
  */
object TopKPlan {

  /** Logical node: child's rows pruned to the top `k` per `grouping` under
    * `ordering` (best = first in `ordering`), plus a 1-based `rank`. */
  final case class TopKPerGroupNode(
      grouping: Seq[Expression],
      ordering: Seq[SortOrder],
      k: Int,
      rankAttr: Attribute,
      child: LogicalPlan) extends UnaryNode {
    require(grouping.nonEmpty, "topKPerGroup needs ≥1 grouping column")
    require(k > 0, s"k must be positive, got $k")
    override def output: Seq[Attribute] = child.output :+ rankAttr
    override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)
    override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
      copy(child = newChild)
  }

  /** Plans the logical node as partial-prune → (exchange) → final-prune.
    * The exchange is NOT emitted here: [[TopKFinalExec]] declares a
    * clustered requirement and `EnsureRequirements` inserts the hash
    * exchange between the two — so AQE still owns partition counts. */
  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerGroupNode(grouping, ordering, k, rankAttr, child) =>
        TopKFinalExec(grouping, ordering, k, rankAttr,
          TopKPartialExec(grouping, ordering, k, planLater(child))) :: Nil
      case _ => Nil
    }
  }

  /** Shared drain-then-emit codegen (the SortExec blocking pattern): the
    * child's whole pipeline — scan, filters, projections — stays fused in
    * one generated loop whose body is a single `insert` into the
    * [[TopKHeapBuffer]]; once the input is drained the stage emits via
    * `resultMethod`. What this buys over the interpreted `doExecute`
    * fallback is the removal of the per-row iterator boundary between the
    * child's codegen stage and the heap (volatile hasNext/next calls + row
    * materialization per input row); the admission test itself is the same
    * generated ordering either way. Used by both physical operators — they
    * differ only in buffer construction and which result iterator they
    * drain; each keeps its interpreted fallback for
    * `spark.sql.codegen.wholeStage=false`. */
  private[plans] trait TopKCodegen extends BlockingOperatorWithCodegen {
    self: UnaryExecNode =>
    protected def bufferFactory: TopKBufferFactory
    protected def resultMethod: String

    override def inputRDDs(): Seq[RDD[InternalRow]] =
      child.asInstanceOf[CodegenSupport].inputRDDs()

    // Set in doProduce, read by doConsume (which the child's produce() calls
    // back into while doProduce is generating the drain function).
    private var bufferTerm: String = _

    override protected def doProduce(ctx: CodegenContext): String = {
      val needInput = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN,
        "topkNeedInput", v => s"$v = true;")
      val factory = ctx.addReferenceObj("topkFactory", bufferFactory,
        classOf[TopKBufferFactory].getName)
      bufferTerm = ctx.addMutableState(classOf[TopKHeapBuffer].getName,
        "topkBuffer", v => s"$v = $factory.create();")
      val outIter = ctx.addMutableState("scala.collection.Iterator",
        "topkOutput")
      val drainName = ctx.freshName("topkDrainInput")
      val drainInput = ctx.addNewFunction(drainName,
        s"""
          |private void $drainName() throws java.io.IOException {
          |  ${child.asInstanceOf[CodegenSupport].produce(ctx, this)}
          |}
          |""".stripMargin)
      val row = ctx.freshName("topkOutRow")
      s"""
        |if ($needInput) {
        |  $drainInput();
        |  $needInput = false;
        |  $outIter = $bufferTerm.$resultMethod();
        |}
        |while ($limitNotReachedCond $outIter.hasNext()) {
        |  UnsafeRow $row = (UnsafeRow) $outIter.next();
        |  ${consume(ctx, null, row)}
        |  if (shouldStop()) return;
        |}
        |""".stripMargin
    }

    override def doConsume(ctx: CodegenContext, input: Seq[ExprCode],
        row: ExprCode): String =
      s"""
        |${row.code}
        |$bufferTerm.insert((UnsafeRow) ${row.value});
        |""".stripMargin
  }

  /** Per-partition bounded heaps: for every group key seen in the
    * partition, keep the k best rows; emit them unranked (map-side prune,
    * shuffle-input shape). Codegen via [[TopKCodegen]]. */
  final case class TopKPartialExec(grouping: Seq[Expression],
      ordering: Seq[SortOrder], k: Int, child: SparkPlan)
    extends UnaryExecNode with TopKCodegen {
    override def output: Seq[Attribute] = child.output
    // Per-partition pruning moves no rows: if the child is already
    // hash-partitioned on the grouping keys (bucketed read, prior
    // aggregate), EnsureRequirements sees it and plans NO exchange at all.
    override def outputPartitioning: Partitioning = child.outputPartitioning
    override protected def doExecute(): RDD[InternalRow] =
      child.execute().mapPartitions({ iter =>
        prunePartition(iter, grouping, ordering, k, child.output)
          .flatMap(_._2)
      }, preservesPartitioning = true)

    override protected def bufferFactory: TopKBufferFactory =
      TopKBufferFactory(grouping, ordering, k, child.output)
    override protected def resultMethod: String = "result"

    override def needCopyResult: Boolean = false // buffer rows are private copies

    override protected def withNewChildInternal(newChild: SparkPlan): TopKPartialExec =
      copy(child = newChild)
  }

  /** Post-shuffle merge: every group's surviving rows are co-located, so a
    * second bounded-heap pass yields the global top k; rows leave sorted
    * with a 1-based rank column appended. Codegen via [[TopKCodegen]]: the
    * post-exchange insert loop fuses with the InputAdapter, and the ranked
    * emit feeds the downstream stage without an iterator boundary. */
  final case class TopKFinalExec(grouping: Seq[Expression],
      ordering: Seq[SortOrder], k: Int, rankAttr: Attribute,
      child: SparkPlan) extends UnaryExecNode with TopKCodegen {
    override def output: Seq[Attribute] = child.output :+ rankAttr
    override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)
    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(grouping) :: Nil
    // Rows never move between partitions here, so the exchange's hash
    // partitioning survives — a downstream groupBy/join on the same keys
    // plans shuffle-free on top of this operator.
    override def outputPartitioning: Partitioning = child.outputPartitioning

    override protected def bufferFactory: TopKBufferFactory =
      TopKBufferFactory(grouping, ordering, k, child.output, Some(output))
    override protected def resultMethod: String = "resultRanked"
    // resultRanked reuses its projection's output buffer row-to-row.
    override def needCopyResult: Boolean = true
    override protected def doExecute(): RDD[InternalRow] = {
      val childOutput = child.output
      val allOutput = output
      child.execute().mapPartitions { iter =>
        val rowOrd = GenerateOrdering.generate(ordering, childOutput)
        val toUnsafe = UnsafeProjection.create(allOutput, allOutput)
        val rankRow = new GenericInternalRow(1)
        val joined = new JoinedRow
        prunePartition(iter, grouping, ordering, k, childOutput).flatMap {
          case (_, rows) =>
            rows.sortInPlace()(rowOrd.asInstanceOf[Ordering[InternalRow]])
            rows.iterator.zipWithIndex.map { case (row, i) =>
              rankRow.setInt(0, i + 1)
              toUnsafe(joined(row, rankRow))
            }
        }
      }
    }
    override protected def withNewChildInternal(newChild: SparkPlan): TopKFinalExec =
      copy(child = newChild)
  }

  /** Shared partial/final kernel: hash map of bounded heaps keyed by the
    * grouping projection. The heap's head is the WORST retained row (max
    * under the ascending "better-first" row ordering), so admission is one
    * comparison and eviction is O(log k). */
  private def prunePartition(iter: Iterator[InternalRow], grouping: Seq[Expression],
      ordering: Seq[SortOrder], k: Int, inputSchema: Seq[Attribute])
      : Iterator[(UnsafeRow, scala.collection.mutable.ArrayBuffer[InternalRow])] = {
    val keyProj = UnsafeProjection.create(grouping, inputSchema)
    val rowOrd = GenerateOrdering.generate(ordering, inputSchema)
      .asInstanceOf[Ordering[InternalRow]]
    val heaps = scala.collection.mutable.HashMap
      .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
    iter.foreach { row =>
      val key = keyProj(row)
      val heap = heaps.getOrElse(key, null) match {
        case null =>
          val h = scala.collection.mutable.PriorityQueue.empty[InternalRow](rowOrd)
          heaps(key.copy()) = h
          h
        case h => h
      }
      if (heap.size < k) heap.enqueue(row.copy())
      else if (rowOrd.compare(row, heap.head) < 0) {
        heap.dequeue(); heap.enqueue(row.copy())
      }
    }
    heaps.iterator.map { case (key, heap) =>
      val buf = scala.collection.mutable.ArrayBuffer.from(heap)
      (key, buf)
    }
  }

  /** DataFrame API over the operator. `orderBy`: (column name, descending?)
    * pairs, best-first; include a tie-break for determinism. Installs the
    * strategy into the session's experimental strategies if absent (the
    * extensions path, `graft.plans.GraftExtensions`, does the same at
    * session build). */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int, rankName: String = "rank"): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(Strategy))
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ Strategy
    val analyzed = df.queryExecution.analyzed
    // honor the session's name-resolution mode: with the default
    // spark.sql.caseSensitive=false, "EVENT_ID" must resolve event_id
    // exactly as df.select would (review r12 — an exact-equality lookup
    // here diverged from the analyzer's semantics)
    val caseSensitive =
      spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
    // Locale.ROOT: Spark's analyzer is locale-insensitive; a default-
    // locale lowercase under tr-TR maps "ID" -> "ıd" and fails to
    // resolve `id` (ADVICE r12)
    def canon(n: String) =
      if (caseSensitive) n else n.toLowerCase(java.util.Locale.ROOT)
    val byName = analyzed.output.groupBy(a => canon(a.name))
    def resolve(n: String) = byName.getOrElse(canon(n),
      throw new IllegalArgumentException(
        s"no column $n in ${analyzed.output.map(_.name)}")) match {
      case Seq(a) => a
      case dups => throw new IllegalArgumentException(
        s"ambiguous column $n: ${dups.size} attributes carry that name " +
          "(disambiguate with select/alias first)") // mirror the DataFrame API's error
    }
    val node = TopKPerGroupNode(
      groupCols.map(resolve),
      orderBy.map { case (n, desc) =>
        SortOrder(resolve(n), if (desc) Descending else Ascending) },
      k,
      AttributeReference(rankName, IntegerType, nullable = false)(),
      analyzed)
    GraftBridge.ofRows(spark, node)
  }
}
