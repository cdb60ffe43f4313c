package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Logical node for top-k-per-key: child's rows, at most `k` per
  * distinct `keys` value, ranked 1..k by `order`, rank exposed as
  * `rankAttr`. Expressions are RESOLVED against the child at
  * construction ([[TopKPerKey.topK]]), so the node analyzes as-is.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Physical top-k-per-key via bounded heaps — the whole-operator custom
  * plan (SURVEY §5 preference (c): LogicalPlan + SparkStrategy +
  * SparkPlan, registered per-session).
  *
  * Why not `row_number().over(window)` + filter: the window form SORTS
  * every partition fully — O(n log n) CPU and O(n) sort buffer per
  * partition even though only k rows per key survive. This operator
  * keeps one k-bounded heap per key: O(n log k) CPU, O(k·distinct-keys)
  * memory, NO sort exchange property required — only hash clustering,
  * which [[requiredChildDistribution]] declares so Spark inserts exactly
  * the one shuffle the semantics need. At 100 TB with bounded key
  * cardinality this is the difference between spill-prone sorts and a
  * small in-memory state per task.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode
    with org.apache.spark.sql.execution.BlockingOperatorWithCodegen {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
  import org.apache.spark.sql.execution.CodegenSupport

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) AllTuples :: Nil else ClusteredDistribution(keys) :: Nil

  /** Executor-side heap state, shared by both execution paths. */
  def createAccumulator(): TopKAccumulator =
    new TopKAccumulator(
      UnsafeProjection.create(keys, child.output),
      RowOrdering.create(order, child.output), k)

  /** Codegen entry point: sort each key's ≤ k survivors, append ranks
    * 1..k, project to the output schema (see [[TopKRanked.iterator]]). */
  def rankedIterator(acc: TopKAccumulator): java.util.Iterator[UnsafeRow] =
    TopKRanked.iterator(acc, output, order)

  // ---- whole-stage codegen (blocking pattern, see partial below) ----

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    child.asInstanceOf[CodegenSupport].inputRDDs()

  private var accVariable: String = _

  override protected def doProduce(ctx: CodegenContext): String = {
    val needAccum = ctx.addMutableState(
      CodeGenerator.JAVA_BOOLEAN, "topkFinalNeedAccum", v => s"$v = true;")
    val thisPlan = ctx.addReferenceObj("topkFinalPlan", this)
    accVariable = ctx.addMutableState(
      classOf[TopKAccumulator].getName, "topkFinalAcc",
      v => s"$v = $thisPlan.createAccumulator();", forceInline = true)
    val ranked = ctx.addMutableState(
      "java.util.Iterator", "topkRanked", forceInline = true)
    val addToAcc = ctx.freshName("addToTopKFinalHeaps")
    val addToAccFunc = ctx.addNewFunction(addToAcc,
      s"""
         |private void $addToAcc() throws java.io.IOException {
         |  ${child.asInstanceOf[CodegenSupport].produce(ctx, this)}
         |}
       """.stripMargin.trim)
    val outputRow = ctx.freshName("topkFinalRow")
    s"""
       |if ($needAccum) {
       |  $addToAccFunc();
       |  $ranked = $thisPlan.rankedIterator($accVariable);
       |  $needAccum = false;
       |}
       |while ($limitNotReachedCond $ranked.hasNext()) {
       |  UnsafeRow $outputRow = (UnsafeRow) $ranked.next();
       |  ${consume(ctx, null, outputRow)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin.trim
  }

  override def doConsume(
      ctx: CodegenContext, input: Seq[ExprCode], row: ExprCode): String =
    s"""
       |${row.code}
       |$accVariable.insert(${row.value});
     """.stripMargin

  // ---- interpreted fallback ----

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val outAttrs = output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions { iter =>
      val acc = new TopKAccumulator(
        UnsafeProjection.create(keyExprs, childOutput),
        RowOrdering.create(sortOrder, childOutput), limit)
      while (iter.hasNext) acc.insert(iter.next())
      import scala.jdk.CollectionConverters._
      TopKRanked.iterator(acc, outAttrs, sortOrder).asScala
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Shared ranked-emit: sort each key's ≤ k survivors with the forward
  * ordering, append ranks 1..k, project to `outAttrs`. Output is
  * ≤ k·keys rows — the per-row copy() (the projection reuses its
  * buffer) is noise next to the input volume. The sort ordering is
  * resolved against `outAttrs.dropRight(1)` = the child schema. */
private[plans] object TopKRanked {
  def iterator(
      acc: TopKAccumulator,
      outAttrs: Seq[Attribute],
      sortOrder: Seq[SortOrder]): java.util.Iterator[UnsafeRow] = {
    val ordering = RowOrdering.create(sortOrder, outAttrs.dropRight(1))
    val forward = new java.util.Comparator[InternalRow] {
      def compare(a: InternalRow, b: InternalRow): Int = ordering.compare(a, b)
    }
    val joined = new JoinedRow
    val rankRow = new GenericInternalRow(1)
    val outProj = UnsafeProjection.create(outAttrs, outAttrs)
    import scala.jdk.CollectionConverters._
    acc.heaps.entrySet().iterator().asScala.flatMap { e =>
      val arr = e.getValue.toArray(new Array[InternalRow](e.getValue.size))
      java.util.Arrays.sort(arr, forward)
      arr.iterator.zipWithIndex.map { case (r, i) =>
        rankRow.setInt(0, i + 1)
        outProj(joined(r, rankRow)).copy()
      }
    }.asJava
  }
}

/** Incremental k-bounded heap state: one PriorityQueue per key. Heap
  * head = WORST kept row (reverse ordering) so a better incoming row
  * evicts it in O(log k); strict-< eviction keeps the first k arrivals
  * among order-equal rows. `insert` is called row-at-a-time from
  * whole-stage-generated code ([[TopKPerKeyPartialExec.doConsume]]), so
  * the class and its methods are public and generics-free on the hot
  * signature. Incoming rows are ephemeral (Spark reuses the buffer) —
  * retained rows and keys are `copy()`d. */
final class TopKAccumulator(
    keyProj: UnsafeProjection,
    ordering: java.util.Comparator[InternalRow],
    limit: Int) {
  private val reverse = new java.util.Comparator[InternalRow] {
    def compare(a: InternalRow, b: InternalRow): Int = ordering.compare(b, a)
  }
  val heaps =
    new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()

  def insert(row: InternalRow): Unit = {
    val key = keyProj(row)
    var q = heaps.get(key)
    if (q == null) {
      q = new java.util.PriorityQueue[InternalRow](limit + 1, reverse)
      heaps.put(key.copy(), q)
    }
    if (q.size < limit) q.add(row.copy())
    else if (ordering.compare(row, q.peek()) < 0) {
      q.poll(); q.add(row.copy())
    }
  }

  /** All surviving rows, heap emit order (the final heap re-ranks). */
  def drain(): java.util.Iterator[InternalRow] = {
    val vals = new java.util.ArrayList[InternalRow]()
    val it = heaps.values().iterator()
    while (it.hasNext) vals.addAll(it.next())
    vals.iterator()
  }
}

private[plans] object TopKHeaps {
  def accumulate(
      iter: Iterator[InternalRow],
      keyProj: UnsafeProjection,
      ordering: java.util.Comparator[InternalRow],
      limit: Int)
      : java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]] = {
    val acc = new TopKAccumulator(keyProj, ordering, limit)
    while (iter.hasNext) acc.insert(iter.next())
    acc.heaps
  }
}

/** PARTIAL (map-side) top-k pruning — the combiner of the heap
  * operator, run BEFORE the exchange with no distribution requirement:
  * each upstream partition keeps at most k rows per key it has seen, so
  * the shuffle moves ≤ k·keys·partitions rows instead of n. Lossless
  * under a total order (a row outside its partition's local top-k can
  * never be in the global top-k); Spark's own partial aggregation and
  * WindowGroupLimit make the same move — this one needs no sort. The
  * rank is NOT computed here (ranks only exist after the final merge).
  */
case class TopKPerKeyPartialExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode
    with org.apache.spark.sql.execution.BlockingOperatorWithCodegen {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
  import org.apache.spark.sql.execution.CodegenSupport

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  // ---- whole-stage codegen (SortExec's blocking-operator pattern) ----
  // The child's generated loop calls insert() directly on the heap state
  // (doConsume), so accumulation runs inside the same JIT'd function as
  // the scan/filter/project below it — no iterator boundary on the
  // map-side hot path. Produce then drains the ≤ k·keys survivors.

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    child.asInstanceOf[CodegenSupport].inputRDDs()

  /** Executor-side state factory, invoked from generated code via a
    * plan reference object. */
  def createAccumulator(): TopKAccumulator =
    new TopKAccumulator(
      UnsafeProjection.create(keys, child.output),
      RowOrdering.create(order, child.output), k)

  private var accVariable: String = _

  override protected def doProduce(ctx: CodegenContext): String = {
    val needAccum = ctx.addMutableState(
      CodeGenerator.JAVA_BOOLEAN, "topkNeedAccum", v => s"$v = true;")
    val thisPlan = ctx.addReferenceObj("topkPartialPlan", this)
    accVariable = ctx.addMutableState(
      classOf[TopKAccumulator].getName, "topkAcc",
      v => s"$v = $thisPlan.createAccumulator();", forceInline = true)
    val drained = ctx.addMutableState(
      "java.util.Iterator", "topkDrained", forceInline = true)
    val addToAcc = ctx.freshName("addToTopKHeaps")
    val addToAccFunc = ctx.addNewFunction(addToAcc,
      s"""
         |private void $addToAcc() throws java.io.IOException {
         |  ${child.asInstanceOf[CodegenSupport].produce(ctx, this)}
         |}
       """.stripMargin.trim)
    val outputRow = ctx.freshName("topkOutputRow")
    s"""
       |if ($needAccum) {
       |  $addToAccFunc();
       |  $drained = $accVariable.drain();
       |  $needAccum = false;
       |}
       |while ($limitNotReachedCond $drained.hasNext()) {
       |  UnsafeRow $outputRow = (UnsafeRow) $drained.next();
       |  ${consume(ctx, null, outputRow)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin.trim
  }

  override def doConsume(
      ctx: CodegenContext, input: Seq[ExprCode], row: ExprCode): String =
    s"""
       |${row.code}
       |$accVariable.insert(${row.value});
     """.stripMargin

  // ---- interpreted fallback (codegen disabled / fallback path) ----

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions { iter =>
      val ordering = RowOrdering.create(sortOrder, childOutput)
      val heaps = TopKHeaps.accumulate(
        iter, UnsafeProjection.create(keyExprs, childOutput), ordering, limit)
      import scala.jdk.CollectionConverters._
      // emit order is irrelevant — the final heap re-ranks
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyPartialExec =
    copy(child = newChild)
}

/** Planner strategy: final heap over a partial (map-side) pruning pass.
  * EnsureRequirements inserts the hash exchange between them exactly
  * when the child isn't already clustered (e.g. bucketed reads skip it,
  * and then partial+final run co-located — a cheap second pass). */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, rankAttr, child) =>
      TopKPerKeyExec(keys, order, k, rankAttr,
        TopKPerKeyPartialExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule (`Rule[LogicalPlan]`, SURVEY §5 tier (c)): rewrites
  * the universal top-k-per-key SQL idiom
  *
  *   SELECT ..., row_number() OVER (PARTITION BY p ORDER BY o) AS rn
  *   ... WHERE rn <= k
  *
  * i.e. `Filter(rn ≤ k, Window(Seq(rn := row_number() over spec), ...))`
  * into [[TopKPerKeyNode]] — so ANY query written with the window idiom
  * (spark.sql text included) gets the bounded-heap physical operator
  * (no per-partition sort, O(k·keys) state) without knowing the API
  * exists. This is the declarative contract at work: users state WHAT
  * (rank-filter), the engine picks HOW (heaps, not sorts).
  *
  * Deliberately conservative — rewrites only when provably safe:
  *  - the Window computes EXACTLY ONE expression and it is row_number()
  *    (more expressions ⇒ other columns would be lost);
  *  - the filter condition is exactly `rn <= lit` / `rn < lit` on the
  *    rank attribute with a positive effective k;
  *  - the rewritten node's output reuses the alias's exprId, so parent
  *    operators resolve unchanged.
  * The heap keeps the FIRST k arrivals among order-ties — the same
  * stable behavior as row_number over a stable sort (TopKPerKeySpec
  * covers the duplicate-row case).
  */
object TopKRewriteRule
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{
    Alias, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber,
    WindowExpression}
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Window}

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window)
        if w.windowExpressions.length == 1 =>
      (w.windowExpressions.head, cond) match {
        case (alias @ Alias(WindowExpression(RowNumber(), _), _),
              Comparison(attr, k))
            if attr.semanticEquals(alias.toAttribute) && k >= 1 =>
          TopKPerKeyNode(
            w.partitionSpec, w.orderSpec, k,
            alias.toAttribute.asInstanceOf[AttributeReference],
            stripGroupLimit(w, k))
        case _ => f
      }
  }

  /** Spark's own InferWindowGroupLimit runs earlier and plants a
    * WindowGroupLimit (per-partition SORTED rank pruning) under the
    * Window. Under the heap operator it is pure overhead — the heap
    * already bounds state to k per key without any sort — so drop it
    * when it provably prunes to the same (or a looser) limit on the
    * same keys/order. (Tradeoff note: WGL's partial mode DOES prune
    * map-side before the shuffle at the cost of a local sort; a future
    * partial-heap mode of TopKPerKeyExec would reclaim that without
    * sorting.) */
  private def stripGroupLimit(w: Window, k: Int): LogicalPlan = {
    import org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit
    w.child match {
      case wgl: WindowGroupLimit
          if wgl.limit >= k &&
            wgl.partitionSpec.length == w.partitionSpec.length &&
            wgl.partitionSpec.zip(w.partitionSpec)
              .forall { case (a, b) => a.semanticEquals(b) } &&
            wgl.orderSpec.length == w.orderSpec.length &&
            wgl.orderSpec.zip(w.orderSpec)
              .forall { case (a, b) => a.semanticEquals(b) } =>
        wgl.child
      case c => c
    }
  }

  /** `rn <= lit` or `rn < lit`, normalized to an inclusive k. */
  private object Comparison {
    def unapply(e: Expression): Option[(Expression, Int)] = e match {
      case LessThanOrEqual(a, IntegerLiteral(k)) => Some((a, k))
      case LessThan(a, IntegerLiteral(k)) => Some((a, k - 1))
      case _ => None
    }
  }
}

object TopKPerKey {

  /** Top-k rows per key with a 1..k rank column appended.
    *
    * @param orderSpec (columnName, ascending) — must be a TOTAL order
    *        (include a tiebreak) for deterministic results, same as you
    *        would give row_number.
    *
    * Tie semantics (relevant only if the order is NOT total): the heap's
    * strict-`<` eviction means a row comparing EQUAL to the current worst
    * never evicts it, i.e. the FIRST k arrivals among order-equal rows
    * are kept — the same stable behavior as `row_number` over a stable
    * per-partition sort. Both forms pick arbitrarily (arrival/partition
    * order) among ties, so neither is cross-run deterministic without a
    * tiebreak; fully-duplicate rows are safe either way (identical
    * content, spec'd in TopKPerKeySpec). Supply a unique tiebreak column
    * whenever the result is hash-compared.
    */
  def topK(df: DataFrame, keyNames: Seq[String],
           orderSpec: Seq[(String, Boolean)], k: Int,
           rankName: String = "rk"): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    ensureStrategy(spark)
    val child = df.queryExecution.analyzed
    val resolve = GraftBridge.resolver(spark)
    def attr(name: String): Attribute =
      child.output.find(a => resolve(a.name, name)).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${child.output.map(_.name)}"))
    val keys = keyNames.map(attr)
    val order = orderSpec.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    val rankAttr = AttributeReference(rankName, IntegerType, nullable = false)()
    GraftBridge.ofRows(spark, TopKPerKeyNode(keys, order, k, rankAttr, child))
  }

  /** Idempotently add the strategy to the session (public
    * `spark.experimental` hook; GraftExtensions does the same for
    * config-driven sessions). */
  def ensureStrategy(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
  }

  /** Idempotently add [[TopKRewriteRule]] too, so window-idiom SQL gets
    * the heap operator in sessions not built with GraftExtensions. */
  def ensureRule(spark: SparkSession): Unit = synchronized {
    ensureStrategy(spark)
    if (!spark.experimental.extraOptimizations.contains(TopKRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKRewriteRule
  }
}
