package graft.collections

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.core.OCDataset
import graft.expr.OCMask

/** Properties table + linked per-structure tables (reference
  * python/opencosmo/collection/structure/structure.py:96 — SURVEY.md
  * §2.3).
  *
  * The reference pre-materializes the halo→particle join as
  * `<name>_start/_size` contiguous ranges plus `<name>_idx` 1→0/1
  * links, and lazily rebuilds row indices after filters
  * (handler.py:187-350, Rust merge-joins). All of that machinery IS
  * the join algorithm Spark already has: here each child table simply
  * carries the parent's key (`linkKey`), predicates stay on the
  * parent, and child access is an equi-join that Catalyst plans as
  * broadcast or sort-merge as sizes dictate. The 1→range contiguity
  * trick survives as a STORAGE property: write children clustered by
  * linkKey (OCIO.write sortColumn) so a parent's rows are co-located
  * in row groups.
  */
final case class StructureCollection(
    properties: OCDataset,
    children: Map[String, DataFrame],
    linkKey: String) {

  /** Filter on parent properties; children rebuild lazily at access
    * time (the reference's deferred link rebuild — here it's just
    * that the join runs against the filtered parent).
    */
  def filter(masks: OCMask*): StructureCollection =
    copy(properties = properties.filter(masks: _*))

  /** Filter parents by a predicate on a CHILD table (reference
    * `on_galaxies=True` semi-join, structure.py:860-927): left-semi
    * join — no row duplication, child side only shuffles its keys.
    */
  def filterByChild(child: String, pred: Column): StructureCollection = {
    val matching = children(child).filter(pred).select(col(linkKey))
    // narrowed(), not a raw copy: the semi-join shrinks the parent
    // population, so the IndexUpdate plugin fold must see it like
    // every other narrowing op
    copy(properties = properties.narrowed("filterByChild",
      properties.df.join(matching, Seq(linkKey), "left_semi")))
  }

  /** A child restricted to the current parents (reference: linked
    * dataset rebuild on access, handler.py:281-350).
    */
  def child(name: String): DataFrame =
    children(name).join(properties.df.select(col(linkKey)), Seq(linkKey), "left_semi")

  /** Per-structure aggregation pushed to the child THEN joined back —
    * the distributed analog of `objects()` iteration + per-halo
    * reduction (structure.py:1503-1611): one hash-agg shuffle on the
    * link key, one join (broadcast if the parent set is small).
    */
  def aggregateChild(name: String, aggs: Column*): DataFrame =
    // LEFT join: childless parents stay in the result (null aggs) —
    // the same population rule evaluate/evaluateInsert follow; an
    // inner join silently dropped them, so the three per-structure
    // surfaces returned different populations
    properties.df.join(
      children(name).groupBy(col(linkKey)).agg(aggs.head, aggs.tail: _*),
      Seq(linkKey), "left")

  /** Per-structure evaluate (reference StructureCollection.evaluate,
    * structure.py:521-858): `f` sees one parent row + that structure's
    * child rows and returns an output row. The child side packs each
    * structure's rows with one hash-agg shuffle (`collect_list` —
    * bounded by per-structure size, the same bound the reference's
    * chunked evaluation has), joins to the parent, then runs `f`
    * per structure. The one RDD hop is the "genuine per-partition
    * imperative logic" escape hatch — everything up to it is Catalyst.
    */
  def evaluate(name: String,
               outSchema: org.apache.spark.sql.types.StructType,
               f: (Row, Seq[Row]) => Row): DataFrame = {
    // child(name), not children(name): the pack must only shuffle the
    // CURRENT parents' children — after a 0.1% parent filter, packing
    // the raw table costs ~1000x the needed work
    val c = child(name)
    val packed = c.groupBy(col(linkKey))
      .agg(collect_list(struct(c.columns.map(col).toSeq: _*)).as("__rows"))
    val joined = properties.df.join(packed, Seq(linkKey), "left")
    val parentSchema = org.apache.spark.sql.types.StructType(
      joined.schema.fields.dropRight(1))
    val rdd = joined.rdd.map { r =>
      val raw = r.getAs[scala.collection.Seq[Row]]("__rows")
      val childRows = if (raw == null) Seq.empty[Row] else raw.toSeq
      val parentOnly: Row =
        new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          r.toSeq.dropRight(1).toArray, parentSchema)
      f(parentOnly, childRows)
    }
    properties.df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** 3-D spatial bound on the parent (reference
    * StructureCollection.bound, structure.py:388-519): the octree plan
    * restricts parent structures; children rebuild lazily against the
    * filtered parent at access, like every other parent filter.
    */
  def bound(region: graft.spatial.Region.Region3D,
            coords: (String, String, String) = ("x", "y", "z"),
            level: Int = 4): StructureCollection =
    copy(properties = properties.bound(region, coords, level))

  /** Sky bound on the parent (reference cone/box search over linked
    * structures).
    */
  def boundSky(region: graft.spatial.Region.SkyRegion,
               coords: (String, String) = ("ra", "dec")): StructureCollection =
    copy(properties = properties.boundSky(region, coords))

  /** [[evaluate]] whose results are INSERTED as new parent columns
    * (reference evaluate(..., insert=True), structure.py:521-858): per
    * structure, `f` maps the packed child rows to one value per output
    * column; the values join back onto the parent by link key, so the
    * collection keeps its children and the new columns are filterable
    * like any property. One child-side hash-agg + one (broadcastable)
    * join — no RDD hop, stays in Catalyst when `f` is expressible as
    * aggregate Columns via [[aggregateChild]]; this form is the
    * arbitrary-closure escape hatch.
    */
  def evaluateInsert(name: String,
                     outFields: Seq[org.apache.spark.sql.types.StructField],
                     f: Seq[Row] => Seq[Any]): StructureCollection = {
    // child(name): the user closure must run ONLY over structures in
    // the current (possibly filtered) population — f sees exactly the
    // structures the collection holds, and the pack shuffle shrinks
    // with the filter
    val c = child(name)
    val keyField = properties.df.schema(linkKey)
    val outSchema = org.apache.spark.sql.types.StructType(keyField +: outFields)
    val packed = c.groupBy(col(linkKey))
      .agg(collect_list(struct(c.columns.filter(_ != linkKey).map(col).toSeq: _*))
        .as("__rows"))
    val rdd = packed.rdd.map { r =>
      val vals = f(r.getAs[scala.collection.Seq[Row]]("__rows").toSeq)
      Row.fromSeq(r.getAs[Any](linkKey) +: vals)
    }
    val evaluated = properties.df.sparkSession.createDataFrame(rdd, outSchema)
    // left join: parents with no children keep null results (the
    // reference fills masked values)
    copy(properties = properties.copy(
      df = properties.df.join(evaluated, Seq(linkKey), "left")))
  }

  /** Driver-side per-structure iterator (reference objects()/halos():
    * yields (parent row, child rows)). Parent order follows the
    * parent's sort; children arrive grouped. For DISTRIBUTED
    * per-structure work use [[evaluate]] — this surface exists for
    * API parity and small interactive use, like the reference's own
    * streaming iterator (structure.py:1503-1611 reads per-halo
    * chunks, never the whole particle table).
    *
    * STREAMS, never collects: children are keyed by the parent's sort
    * position (one distributed join + range sort) and both sides
    * drain through `toLocalIterator` — one partition at a time, so
    * the driver holds one partition's rows, not the table, and there
    * is no child-row cap. The ordered parent frame is disk-snapshotted
    * once so the position assignment and the driver iteration read
    * the SAME persisted blocks (their row orders cannot diverge);
    * the snapshot is released when the iterator exhausts.
    *
    * Null link keys: a child row whose `linkKey` is null belongs to no
    * structure and is EXCLUDED (SQL join semantics — null never equals
    * null), rather than silently grouped under a null parent. Parents
    * with a null key yield their row with zero children.
    *
    * Cleanup: the parent snapshot is released when `hasNext` first
    * observes exhaustion. An ABANDONED (partially-drained) iterator
    * defers its block cleanup to Spark's ContextCleaner at GC time;
    * callers that stop early can release eagerly via the returned
    * iterator's `close()` (it is `AutoCloseable`).
    */
  def objects(name: String): Iterator[(Row, Seq[Row])] with AutoCloseable = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import org.apache.spark.sql.graftshim.DiskSnapshot
    val c = child(name)
    val spark = properties.df.sparkSession
    val parents = DiskSnapshot.diskCachedEager(properties.getData)
    val keyed = parents.select(col(linkKey))
    val posDf = spark.createDataFrame(
      keyed.rdd.zipWithIndex.map { case (r, i) => Row(r.get(0), i) },
      StructType(Seq(keyed.schema.head,
        StructField("__pos", LongType, nullable = false))))
    // children as (position, packed row), globally range-sorted so the
    // local iterator receives each structure's rows contiguously
    val cSorted = c.where(col(linkKey).isNotNull).join(posDf, Seq(linkKey))
      .select(col("__pos"), struct(c.columns.map(col).toSeq: _*).as("__row"))
      .sort(col("__pos"))
    val pIt = parents.toLocalIterator().asScala
    val cIt = cSorted.toLocalIterator().asScala.buffered
    new Iterator[(Row, Seq[Row])] with AutoCloseable {
      private var pos = -1L
      private var released = false
      // close() also EXHAUSTS the iterator: after the snapshot's
      // blocks are released, further parent partitions would
      // recompute from the un-persisted plan, and a recomputed row
      // order could diverge from the __pos assignment captured
      // against the snapshot — the exact pairing hazard the snapshot
      // exists to prevent. A closed iterator reports no more
      // elements instead of silently mispairing.
      def close(): Unit = if (!released) {
        released = true; DiskSnapshot.release(parents)
      }
      def hasNext: Boolean = !released && {
        val more = pIt.hasNext
        if (!more) close()
        more
      }
      def next(): (Row, Seq[Row]) = {
        pos += 1
        val p = pIt.next()
        val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
        while (cIt.hasNext && cIt.head.getLong(0) == pos)
          buf += cIt.next().getStruct(1)
        (p, buf.toSeq)
      }
    }
  }

  private implicit class JIter[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }
}
