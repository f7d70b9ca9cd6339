package graft.spatial

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.spatial.Region._

/** Octree query planner (reference python/opencosmo/spatial/
  * octree.py:108-270 + tree.py:249-271 + dataset.py:340-431 `bound` —
  * SURVEY.md §2.7).
  *
  * The reference walks a per-file octree index to turn a region into
  * per-level row ranges (contained cells wholesale, boundary cells
  * re-checked point-by-point). In Spark the same two-phase plan is a
  * single filter over the Morton key column:
  *
  *   key ∈ contained  ∨  (key ∈ boundary ∧ exactPredicate(x,y,z))
  *
  * With data clustered by key at write time, the key ranges line up
  * with parquet row groups, so the catalyst IN-filter prunes at the
  * storage layer — and rows in fully-contained cells skip the exact
  * geometry entirely. Cell classification runs on the DRIVER over at
  * most 8^level cells (recursing from the root, so disjoint subtrees
  * prune early) — exactly the reference's recursion, minus the MPI.
  */
object Octree {

  /** Classified cells at `level`: (fully contained keys, boundary keys). */
  final case class CellPlan(contained: Seq[Long], boundary: Seq[Long])

  /** Recursively classify octree cells against a region.
    * Returns cell keys at exactly `level` (contained) plus boundary
    * cells needing the exact check.
    */
  def classifyCells(region: Region3D, origin: Double, size: Double,
                    level: Int): CellPlan = {
    val contained = Seq.newBuilder[Long]
    val boundary = Seq.newBuilder[Long]

    def recurse(key: Long, cmin: P3, cellSize: Double, depth: Int): Unit = {
      val cmax = P3(cmin.x + cellSize, cmin.y + cellSize, cmin.z + cellSize)
      region.classify(cmin, cmax) match {
        case Disjoint => ()
        case Contained =>
          // expand to level-granularity keys (prefix nesting)
          val shift = 3 * (level - depth)
          val base = key << shift
          contained ++= (0L until (1L << shift)).map(base | _)
        case Intersects =>
          if (depth == level) boundary += key
          else {
            val half = cellSize / 2
            var oct = 0
            while (oct < 8) {
              val dx = (oct & 1); val dy = (oct >> 1) & 1; val dz = (oct >> 2) & 1
              recurse((key << 3) | oct,
                P3(cmin.x + dx * half, cmin.y + dy * half, cmin.z + dz * half),
                half, depth + 1)
              oct += 1
            }
          }
      }
    }

    recurse(0L, P3(origin, origin, origin), size, 0)
    CellPlan(contained.result(), boundary.result())
  }

  /** Two-phase bound filter over coordinate columns. Returns None when
    * the region misses the domain entirely (caller short-circuits to
    * an empty frame — reference dataset.py:389-391).
    */
  def boundFilter(region: Region3D, origin: Double, size: Double, level: Int,
                  x: Column, y: Column, z: Column): Option[Column] = {
    val plan = classifyCells(region, origin, size, level)
    if (plan.contained.isEmpty && plan.boundary.isEmpty) return None
    val key = Morton.keyColumn(x, y, z, origin, size, level)
    val exact = region.predicate(x, y, z)
    val parts = Seq(
      if (plan.contained.nonEmpty) Some(key.isin(plan.contained: _*)) else None,
      if (plan.boundary.nonEmpty) Some(key.isin(plan.boundary: _*) && exact) else None
    ).flatten
    Some(parts.reduce(_ || _))
  }
}
