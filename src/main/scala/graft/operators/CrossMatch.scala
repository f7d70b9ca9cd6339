package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.spatial.{Healpix, Region}

/** Sky cross-match — nearest-neighbor join within an angular radius,
  * the standard multi-catalog association step (beyond the reference,
  * which has no general joins; built from its own HEALPix machinery).
  *
  * Plan shape (the spatial analog of the bucketed interval join):
  * left rows key by their own HEALPix pixel; right rows EXPLODE to
  * every pixel within the match radius of their position (queryDisc —
  * bounded fan-out, a handful of pixels at sane nside/radius); both
  * meet in an ordinary equi-join on the pixel — one shuffle,
  * AQE-skew-splittable — and the exact angular separation trims
  * boundary pixels before a per-left argmin window picks the nearest.
  * A raw theta join on angSep would be a broadcast nested loop:
  * O(|L|·|R|).
  *
  * Output: (leftId, rightId, sep_deg) — one row per left object with
  * at least one right object within `radiusDeg`.
  */
object CrossMatch {

  def nearestWithin(left: DataFrame, right: DataFrame,
                    leftId: String, rightId: String,
                    coords: (String, String),
                    radiusDeg: Double, nside: Int = 16): DataFrame = {
    val (ra, dec) = coords
    val l = left.select(col(leftId).as("__lid"),
      col(ra).as("__lra"), col(dec).as("__ldec"))
      .withColumn("__pix", Healpix.pixelColumn(nside, col("__lra"), col("__ldec")))
    // the disc cover is PER-PIXEL, not per-row: every point in a right
    // pixel shares (conservatively padded) candidate pixels, so the
    // executor-local cache bounds queryDisc calls at 12·nside² per
    // executor regardless of row count. Padding: one pixel size for
    // the right point's offset from its pixel center (queryDisc pads
    // another internally for the left side) — conservative cover,
    // trimmed by the exact separation predicate.
    val halfPix = math.toDegrees(math.sqrt(4.0 * math.Pi / Healpix.npix(nside)))
    val disc = udf { (r: Double, d: Double) =>
      val pix = Healpix.ang2pixNest(nside, r, d)
      CrossMatch.discCache.getOrElseUpdate((nside, pix, radiusDeg), {
        val (cra, cdec) = Healpix.pix2angNest(nside, pix)
        Healpix.queryDisc(nside, Region.SkyP(cra, cdec),
          radiusDeg + halfPix).toSeq
      })
    }
    val r = right.select(col(rightId).as("__rid"),
      col(ra).as("__rra"), col(dec).as("__rdec"))
      .withColumn("__pix", explode(disc(col("__rra"), col("__rdec"))))
    // haversine separation — identical expression to Region.Cone's
    val sd = sin((radians(col("__rdec")) - radians(col("__ldec"))) / 2)
    val sr = sin((radians(col("__rra")) - radians(col("__lra"))) / 2)
    val h = sd * sd + cos(radians(col("__ldec"))) * cos(radians(col("__rdec"))) * sr * sr
    val sep = degrees(asin(least(lit(1.0), sqrt(h))) * 2)
    // nearest-pick ordering rounds the separation to 1e-9 deg (≈ 4 µas
    // — far below any astrometric meaning): mirror-symmetric object
    // pairs have MATHEMATICALLY equal separations that floating point
    // realizes a ulp apart, and a raw-double order would break ties
    // nondeterministically across engines/runs. Ties then resolve by
    // id.
    val w = Window.partitionBy(col("__lid"))
      .orderBy(round(col("__sep"), 9).asc, col("__rid").asc)
    l.join(r, "__pix")
      .withColumn("__sep", sep)
      .filter(col("__sep") <= lit(radiusDeg))
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") === 1)
      .select(col("__lid").as(leftId), col("__rid").as(rightId),
        col("__sep").as("sep_deg"))
  }

  /** Executor-local disc cover cache (bounded: ≤ 12·nside² entries per
    * (nside, radius) in use).
    */
  private val discCache =
    scala.collection.concurrent.TrieMap.empty[(Int, Long, Double), Seq[Long]]
}
