package graft.plugins

import org.apache.spark.sql.DataFrame
import graft.core.{Header, OCDataset}

/** Typed plugin hook points (reference plugins/hook.py:15-71 fold/query
  * registry + plugins/contexts.py:20-130 context set), re-expressed for
  * Spark's execution model.
  *
  * Two deliberate dissolutions versus the reference:
  *
  *  - `DatasetInstantiate`/`LightconeInstantiate` (fired per
  *    `get_data()` there) collapse into the OPEN hooks here: a hook's
  *    transform is a lazy plan rewrite, and Spark re-executes the plan
  *    on every action anyway — rewriting once at open IS
  *    per-materialization behavior, without firing Python-style
  *    callbacks on the hot path.
  *  - `Partition` (an MPI-rank row distribution there) becomes a query
  *    hook that may replace the opened frame with a re-partitioned /
  *    re-organized one; returning None defers to Spark's default file
  *    splits, exactly like the reference defers to its default
  *    strategy.
  *
  * Fold points thread the context through every registered hook whose
  * predicate passes (registration order); query points return the first
  * non-None answer. Transforms must be pure plan rewrites — nothing
  * here triggers a job.
  */
object Hooks {

  final case class Registration[C, R](when: C => Boolean, transform: C => R)

  /** All-matching hooks run, each seeing the previous one's output. */
  final class FoldPoint[C] {
    private val regs =
      new java.util.concurrent.CopyOnWriteArrayList[Registration[C, C]]()
    def register(when: C => Boolean = (_: C) => true)(f: C => C): Unit =
      regs.add(Registration(when, f))
    def fold(ctx: C): C = {
      var c = ctx
      regs.forEach(r => if (r.when(c)) c = r.transform(c))
      c
    }
    def clear(): Unit = regs.clear()
    def isEmpty: Boolean = regs.isEmpty
  }

  /** First hook whose predicate passes AND returns Some wins. */
  final class QueryPoint[C, R] {
    private val regs =
      new java.util.concurrent.CopyOnWriteArrayList[Registration[C, Option[R]]]()
    def register(when: C => Boolean = (_: C) => true)(f: C => Option[R]): Unit =
      regs.add(Registration(when, f))
    def query(ctx: C): Option[R] = {
      val it = regs.iterator()
      while (it.hasNext) {
        val r = it.next()
        if (r.when(ctx)) r.transform(ctx) match {
          case some @ Some(_) => return some
          case None           =>
        }
      }
      None
    }
    def clear(): Unit = regs.clear()
  }

  // ---- contexts (reference contexts.py:20-130) ----------------------

  /** After a filter / bound / take produced a narrowed dataset
    * (reference IndexUpdateCtx — there the new row index, here the new
    * plan). `op` names the operation ("filter", "bound", "take", ...).
    */
  final case class IndexUpdate(op: String, before: OCDataset, after: OCDataset)

  /** At sort materialization (reference PostSortCtx): `df` is the
    * sorted plan; transforms may remap order-sensitive columns.
    */
  final case class PostSort(df: DataFrame, key: String, inverted: Boolean)

  /** At open, once per dataset (reference PartitionCtx, an MPI
    * concern): a responding plugin returns a replacement frame (e.g.
    * `df.repartition(...)`, a bucketed re-read) — None defers to the
    * default file-split partitioning.
    */
  final case class PartitionRequest(header: Header, df: DataFrame)

  // ---- the points ---------------------------------------------------

  /** Fired by OCIO.open after the type-keyed open hooks. */
  val datasetOpen = new FoldPoint[OCDataset]

  /** Fired by OCIO.openLightcone on each step dataset. */
  val lightconeOpen = new FoldPoint[OCDataset]

  /** Fired by OCDataset.filter / bound / boundSky / take. */
  val indexUpdate = new FoldPoint[IndexUpdate]

  /** Fired when a lazy sort key is applied to the plan. */
  val postSort = new FoldPoint[PostSort]

  /** Queried by OCIO.open for a non-default partitioning. */
  val partition = new QueryPoint[PartitionRequest, DataFrame]

  /** Test / lifecycle reset: drop every registration at every point. */
  def clearAll(): Unit = {
    datasetOpen.clear(); lightconeOpen.clear(); indexUpdate.clear()
    postSort.clear(); partition.clear()
  }
}
