package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.DiskSnapshot
import org.apache.spark.storage.StorageLevel

/** Contract of the shared snapshot shim every multi-consumer
  * intermediate now rides (bucketByRank, the KN scorers, TF-IDF
  * weights, MinHash signatures, dedup survivors): lazy/eager
  * materialization semantics, DISK_ONLY storage, lineage preserved,
  * values identical, and the internal-row landing zone.
  */
class DiskSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def lineage(r: org.apache.spark.rdd.RDD[_]): Seq[org.apache.spark.rdd.RDD[_]] =
    r +: r.dependencies.flatMap(d => lineage(d.rdd))

  test("diskCached: identical rows, DISK_ONLY level, lineage kept, lazy") {
    val src = spark.range(0, 500, 1, 4)
      .select(col("id"), (col("id") % 7).cast("double").as("v"),
        concat(lit("s"), col("id")).as("s"))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val group = "disk-snapshot-lazy-probe"
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (js.properties != null &&
            group == js.properties.getProperty("spark.jobGroup.id"))
          jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    spark.sparkContext.setJobGroup(group, "snapshot construction")
    try {
      val snap = DiskSnapshot.diskCached(src)
      Thread.sleep(1000)
      assert(jobs.get == 0, s"diskCached ran ${jobs.get} jobs at construction; must be lazy")
      // values identical (including strings through the InternalRow copy)
      assert(snap.collect().toSeq.sortBy(_.getLong(0)) ==
        src.collect().toSeq.sortBy(_.getLong(0)))
      val rdds = lineage(snap.queryExecution.toRdd
        .asInstanceOf[org.apache.spark.rdd.RDD[_]])
      val persisted = rdds.filter(_.getStorageLevel != StorageLevel.NONE)
      assert(persisted.nonEmpty, "no persisted RDD under the snapshot")
      persisted.foreach(r => assert(r.getStorageLevel == StorageLevel.DISK_ONLY,
        s"level ${r.getStorageLevel}"))
      assert(rdds.forall(!_.isCheckpointed), "snapshot truncated lineage")
      // the session's CacheManager must NOT know about it (no
      // plan-matching leakage into other queries, nothing to unpersist)
      assert(spark.sharedState.cacheManager.lookupCachedData(
        snap.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]).isEmpty,
        "snapshot leaked into the CacheManager")
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(l)
    }
  }

  test("diskCachedEager materializes at construction; consumers read blocks") {
    val evals = spark.sparkContext.longAccumulator("upstream-evals")
    val base = spark.range(0, 100, 1, 2).map { i => evals.add(1L); i }
      .toDF("id")
    val snap = DiskSnapshot.diskCachedEager(base)
    val afterBuild = evals.value
    assert(afterBuild == 100L,
      s"eager snapshot evaluated upstream $afterBuild times; expected one full pass")
    // two further consumers: blocks serve them, upstream never re-runs
    assert(snap.count() == 100 && snap.agg(sum(col("id"))).head().getLong(0) == 4950L)
    assert(evals.value == afterBuild, "a consumer recomputed the upstream")
  }

  test("dfFromInternalRows lands unsafe rows without an encoder pass") {
    val src = spark.range(0, 50).select(col("id"),
      transform(sequence(lit(0), lit(2)), x => x * col("id")).as("arr"))
    val rdd = src.queryExecution.asInstanceOf[Any] match {
      case qe: org.apache.spark.sql.execution.QueryExecution =>
        qe.toRdd.map(_.copy())
    }
    val back = DiskSnapshot.dfFromInternalRows(spark, rdd, src.schema)
    assert(back.schema == src.schema)
    assert(back.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap ==
      src.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap)
  }
}
