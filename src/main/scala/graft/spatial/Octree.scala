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
  *   key ∈ containedRanges  ∨  (key ∈ boundaryRanges ∧ exact(x,y,z))
  *
  * Cells are carried as half-open KEY RANGES [lo, hi), not enumerated
  * ids: a contained subtree at depth d is ONE range covering all
  * 8^(level−d) of its leaves, so driver memory and predicate size are
  * O(region surface), never O(region volume) — at level 10 a box
  * covering half the domain is a handful of ranges instead of ~5·10⁸
  * IN-list entries. Ranges also lower to `key >= lo AND key < hi`,
  * exactly the shape parquet row-group min/max stats prune when the
  * data is clustered by key (io/OCIO.writeSpatial), mirroring the
  * reference's contiguous index ranges (tree.py:272-282 apply_index).
  * Cell classification runs on the DRIVER recursing from the root, so
  * disjoint subtrees prune early — the reference's recursion, minus
  * the MPI.
  */
object Octree {

  /** Classified cells at `level` as sorted, merged half-open Morton
    * key ranges: fully contained (no point test needed) and boundary
    * (exact geometry re-check).
    */
  final case class CellPlan(contained: Seq[(Long, Long)], boundary: Seq[(Long, Long)])

  /** Recursively classify octree cells against a region into key
    * ranges at `level` granularity.
    */
  def classifyCells(region: Region3D, origin: Double, size: Double,
                    level: Int): CellPlan = {
    val contained = Seq.newBuilder[(Long, Long)]
    val boundary = Seq.newBuilder[(Long, Long)]

    def recurse(key: Long, cmin: P3, cellSize: Double, depth: Int): Unit = {
      val cmax = P3(cmin.x + cellSize, cmin.y + cellSize, cmin.z + cellSize)
      region.classify(cmin, cmax) match {
        case Disjoint => ()
        case Contained =>
          // one range spans the whole subtree (prefix nesting).
          // SATURATE the exclusive upper bound: at level 21 the top
          // cell's (key+1) << shift crosses 2^63 and goes NEGATIVE,
          // silently filtering out the whole contained subtree
          val shift = 3 * (level - depth)
          val hi0 = (key + 1L) << shift
          contained += ((key << shift,
            if (hi0 <= (key << shift)) Long.MaxValue else hi0))
        case Intersects =>
          if (depth == level) boundary += ((key, key + 1L))
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
    // recursion visits children in Morton order → ranges arrive sorted;
    // merge adjacent runs to minimize predicate width
    CellPlan(merge(contained.result()), merge(boundary.result()))
  }

  /** Merge adjacent/overlapping sorted half-open ranges. */
  def merge(rs: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    if (rs.isEmpty) return rs
    val out = Seq.newBuilder[(Long, Long)]
    var (lo, hi) = rs.head
    rs.tail.foreach { case (l, h) =>
      if (l <= hi) hi = math.max(hi, h)
      else { out += ((lo, hi)); lo = l; hi = h }
    }
    out += ((lo, hi))
    out.result()
  }

  /** OR of half-open range predicates over a key column (single-cell
    * ranges tighten to equality). The OR tree is BALANCED — a
    * left-deep chain of a few thousand disjuncts overflows the
    * recursive Column→Expression conversion and defeats codegen;
    * balancing keeps depth at log₂(n).
    */
  def rangePredicate(key: Column, rs: Seq[(Long, Long)]): Option[Column] =
    if (rs.isEmpty) None
    else Some(balancedOr(rs.map { case (lo, hi) =>
      if (hi == lo + 1L) key === lit(lo)
      else key >= lit(lo) && key < lit(hi)
    }))

  private def balancedOr(cs: Seq[Column]): Column =
    if (cs.size == 1) cs.head
    else {
      val (l, r) = cs.splitAt(cs.size / 2)
      balancedOr(l) || balancedOr(r)
    }

  /** Two-phase bound filter. Returns None when the region misses the
    * domain entirely (caller short-circuits to an empty frame —
    * reference dataset.py:389-391).
    *
    * `storedKey = (column, keyLevel)` uses a persisted Morton column
    * written at `keyLevel` (OCIO.writeSpatial): no per-row key
    * recompute, and the scan prunes on the column's row-group stats.
    * Classification still runs at min(level, keyLevel) — predicate
    * granularity is decoupled from storage granularity — and the
    * resulting ranges shift up to keyLevel units (prefix nesting:
    * a level-l cell is the key interval [k·8^(L−l), (k+1)·8^(L−l))
    * at stored level L), so a deep stored index never bloats the
    * predicate.
    *
    * `keyRegion` is the region expressed in the KEY's coordinate
    * system — it differs from `region` (the exact predicate, in the
    * columns' current units) when a stored key predates a unit
    * conversion.
    */
  /** Widest range plan lowered to a predicate: beyond this the
    * classification level steps down (coarser cells, more boundary
    * exact-checks) — a predicate with thousands of disjuncts blows
    * codegen method limits and optimizer time for no pruning gain.
    *
    * The budget differs by key source. A STORED key column feeds
    * parquet row-group pruning, where every extra range is more
    * skipped IO — wide plans pay. A key COMPUTED per row prunes
    * nothing at the scan; each range is just comparisons against the
    * (cheap, single-expression) exact geometry check, so fragmented
    * regions (spheres at fine levels) must coarsen much sooner —
    * measured at sf0.1, a ~500-range computed sphere plan was 4×
    * slower than the exact predicate alone.
    */
  val MaxRangesStored = 512
  val MaxRangesComputed = 64

  def boundFilter(region: Region3D, origin: Double, size: Double, level: Int,
                  x: Column, y: Column, z: Column,
                  storedKey: Option[(Column, Int)] = None,
                  keyRegion: Option[Region3D] = None,
                  maxRangesOverride: Option[Int] = None): Option[Column] = {
    val maxRanges = maxRangesOverride.getOrElse(
      if (storedKey.isDefined) MaxRangesStored else MaxRangesComputed)
    var classifyLevel = storedKey.fold(level) { case (_, kl) => math.min(level, kl) }
    var plan0 = classifyCells(keyRegion.getOrElse(region), origin, size, classifyLevel)
    while (classifyLevel > 0 &&
           plan0.contained.size + plan0.boundary.size > maxRanges) {
      classifyLevel -= 1
      plan0 = classifyCells(keyRegion.getOrElse(region), origin, size, classifyLevel)
    }
    if (plan0.contained.isEmpty && plan0.boundary.isEmpty) return None
    val shift = storedKey.fold(0) { case (_, kl) => 3 * (kl - classifyLevel) }
    // same saturation as classifyCells: a stored level-21 index's top
    // range would overflow to a negative hi and silently drop rows
    def up(rs: Seq[(Long, Long)]) = rs.map { case (lo, hi) =>
      val hi2 = hi << shift
      (lo << shift, if (shift > 0 && hi2 <= (lo << shift)) Long.MaxValue else hi2)
    }
    val plan = if (shift == 0) plan0
      else CellPlan(up(plan0.contained), up(plan0.boundary))
    val key = storedKey.map(_._1)
      .getOrElse(Morton.keyColumn(x, y, z, origin, size, classifyLevel))
    val exact = region.predicate(x, y, z)
    val parts = Seq(
      rangePredicate(key, plan.contained),
      rangePredicate(key, plan.boundary).map(_ && exact)
    ).flatten
    Some(parts.reduce(_ || _))
  }
}
