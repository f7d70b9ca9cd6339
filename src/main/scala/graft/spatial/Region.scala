package graft.spatial

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Region algebra (reference python/opencosmo/spatial/region.py:58-413
  * and relations.py:24-271 — SURVEY.md §2.7). Pure Scala geometry +
  * a `predicate` lowering each region to a Catalyst boolean expression
  * (the exact point-in-region check used on octree boundary cells).
  */
object Region {

  /** Classification of a cell vs a query region (reference
    * octree.py query: CONTAINED / INTERSECTS / NONE).
    */
  sealed trait Rel
  case object Contained extends Rel   // cell fully inside region
  case object Intersects extends Rel  // partial overlap — needs exact check
  case object Disjoint extends Rel

  // ---- 3-D (snapshot) regions -------------------------------------

  final case class P3(x: Double, y: Double, z: Double)

  sealed trait Region3D {
    def contains(p: P3): Boolean
    /** relation of an axis-aligned cell [min,max] to this region. */
    def classify(min: P3, max: P3): Rel
    /** exact predicate over coordinate columns. */
    def predicate(x: Column, y: Column, z: Column): Column
    /** uniform length rescale — the region-to-base-convention
      * conversion (reference region.py:334-353 into_base_convention):
      * a region given in physical/comoving coordinates divides by the
      * convention factor to query scalefree-stored data.
      */
    def scaled(f: Double): Region3D
  }

  /** 3-D axis-aligned box (reference BoxRegion). Half-open [min,max). */
  final case class Box(min: P3, max: P3) extends Region3D {
    require(min.x < max.x && min.y < max.y && min.z < max.z, s"empty box $this")

    def contains(p: P3): Boolean =
      p.x >= min.x && p.x < max.x && p.y >= min.y && p.y < max.y &&
        p.z >= min.z && p.z < max.z

    def classify(cmin: P3, cmax: P3): Rel = {
      val disjoint = cmax.x <= min.x || cmin.x >= max.x ||
        cmax.y <= min.y || cmin.y >= max.y ||
        cmax.z <= min.z || cmin.z >= max.z
      if (disjoint) Disjoint
      else if (cmin.x >= min.x && cmax.x <= max.x &&
               cmin.y >= min.y && cmax.y <= max.y &&
               cmin.z >= min.z && cmax.z <= max.z) Contained
      else Intersects
    }

    def predicate(x: Column, y: Column, z: Column): Column =
      x >= min.x && x < max.x && y >= min.y && y < max.y &&
        z >= min.z && z < max.z

    def intersects(o: Box): Boolean = classify(o.min, o.max) != Disjoint
    def containsBox(o: Box): Boolean = classify(o.min, o.max) == Contained

    def scaled(f: Double): Box =
      Box(P3(min.x * f, min.y * f, min.z * f), P3(max.x * f, max.y * f, max.z * f))
  }

  /** 3-D sphere (the reference builds cones in 2-D; in 3-D the
    * radius-query analog is a sphere — used by `bound` range queries).
    */
  final case class Sphere(center: P3, r: Double) extends Region3D {
    def contains(p: P3): Boolean = {
      val dx = p.x - center.x; val dy = p.y - center.y; val dz = p.z - center.z
      dx * dx + dy * dy + dz * dz <= r * r
    }

    def classify(cmin: P3, cmax: P3): Rel = {
      // closest / farthest point of the AABB to the center
      def clamp(v: Double, lo: Double, hi: Double) = math.max(lo, math.min(hi, v))
      val cx = clamp(center.x, cmin.x, cmax.x)
      val cy = clamp(center.y, cmin.y, cmax.y)
      val cz = clamp(center.z, cmin.z, cmax.z)
      val dmin = sq(cx - center.x) + sq(cy - center.y) + sq(cz - center.z)
      if (dmin > r * r) return Disjoint
      val fx = math.max(math.abs(cmin.x - center.x), math.abs(cmax.x - center.x))
      val fy = math.max(math.abs(cmin.y - center.y), math.abs(cmax.y - center.y))
      val fz = math.max(math.abs(cmin.z - center.z), math.abs(cmax.z - center.z))
      if (sq(fx) + sq(fy) + sq(fz) <= r * r) Contained else Intersects
    }

    def predicate(x: Column, y: Column, z: Column): Column = {
      val dx = x - center.x; val dy = y - center.y; val dz = z - center.z
      dx * dx + dy * dy + dz * dz <= lit(r * r)
    }

    def scaled(f: Double): Sphere =
      Sphere(P3(center.x * f, center.y * f, center.z * f), r * f)
  }

  private def sq(v: Double) = v * v

  // ---- 2-D (sky) regions ------------------------------------------

  /** Point on the sphere in degrees (RA ∈ [0,360), Dec ∈ [−90,90]). */
  final case class SkyP(ra: Double, dec: Double)

  sealed trait SkyRegion {
    def contains(p: SkyP): Boolean
    def predicate(ra: Column, dec: Column): Column
  }

  /** Angular separation in degrees (haversine — the numerically stable
    * form the reference relies on astropy for).
    */
  def angSep(a: SkyP, b: SkyP): Double = {
    val (ra1, de1) = (math.toRadians(a.ra), math.toRadians(a.dec))
    val (ra2, de2) = (math.toRadians(b.ra), math.toRadians(b.dec))
    val sd = math.sin((de2 - de1) / 2); val sr = math.sin((ra2 - ra1) / 2)
    val h = sd * sd + math.cos(de1) * math.cos(de2) * sr * sr
    math.toDegrees(2 * math.asin(math.min(1.0, math.sqrt(h))))
  }

  /** Haversine angular separation (degrees) as a Column expression —
    * THE one copy both the Cone predicate and the cross-match scorer
    * lower (the expression is numerically subtle, and oracle replay
    * depends on every consumer staying bit-identical).
    */
  def angSepDegCol(ra1: Column, dec1: Column, ra2: Column, dec2: Column): Column = {
    val (r1, d1, r2, d2) = (radians(ra1), radians(dec1), radians(ra2), radians(dec2))
    val sd = sin((d2 - d1) / 2); val sr = sin((r2 - r1) / 2)
    val h = sd * sd + cos(d1) * cos(d2) * sr * sr
    degrees(asin(least(lit(1.0), sqrt(h))) * 2)
  }

  /** Cone: all points within `radius` degrees of center (reference
    * ConeRegion).
    */
  final case class Cone(center: SkyP, radius: Double) extends SkyRegion {
    def contains(p: SkyP): Boolean = angSep(center, p) <= radius

    def predicate(ra: Column, dec: Column): Column =
      angSepDegCol(lit(center.ra), lit(center.dec), ra, dec) <= lit(radius)

    def intersects(o: Cone): Boolean = angSep(center, o.center) <= radius + o.radius
    def containsCone(o: Cone): Boolean = angSep(center, o.center) + o.radius <= radius
  }

  /** RA/Dec-aligned box on the sky (reference SkyboxRegion). Handles
    * RA wrap-around at 0/360.
    */
  final case class Skybox(raMin: Double, raMax: Double,
                          decMin: Double, decMax: Double) extends SkyRegion {
    private def raIn(ra: Double): Boolean =
      if (raMin <= raMax) ra >= raMin && ra < raMax
      else ra >= raMin || ra < raMax // wraps 360→0

    def contains(p: SkyP): Boolean =
      raIn(p.ra) && p.dec >= decMin && p.dec < decMax

    def predicate(ra: Column, dec: Column): Column = {
      val raPred =
        if (raMin <= raMax) ra >= lit(raMin) && ra < lit(raMax)
        else ra >= lit(raMin) || ra < lit(raMax)
      raPred && dec >= lit(decMin) && dec < lit(decMax)
    }
  }

  /** Explicit HEALPix pixel set (reference HealpixRegion). */
  final case class HealpixRegion(nside: Int, pixels: Set[Long]) extends SkyRegion {
    def contains(p: SkyP): Boolean =
      pixels.contains(Healpix.ang2pixNest(nside, p.ra, p.dec))

    def predicate(ra: Column, dec: Column): Column =
      Healpix.pixelColumn(nside, ra, dec).isin(pixels.toSeq: _*)

    def union(o: HealpixRegion): HealpixRegion = {
      require(nside == o.nside, "nside mismatch")
      HealpixRegion(nside, pixels ++ o.pixels)
    }
  }

  case object FullSky extends SkyRegion {
    def contains(p: SkyP): Boolean = true
    def predicate(ra: Column, dec: Column): Column = lit(true)
  }

  /** Pairwise sky-region relations (reference relations.py:24-271 —
    * every pair has contains/intersects). Cone↔skybox pairs classify
    * by EXACT spherical distance from the cone center to the box
    * edges (closed forms for parallel and meridian segments) — the
    * earlier boundary-SAMPLING scheme missed small cones slipping
    * between samples (false disjoint: dropped data under pruning) and
    * claimed containment for cones poking through an unsampled RA
    * edge (false containment: wrong rows under pruning).
    */
  object SkyRelations {
    def corners(b: Skybox): Seq[SkyP] = Seq(
      SkyP(b.raMin, b.decMin), SkyP(b.raMin, b.decMax),
      SkyP(b.raMax % 360.0, b.decMin), SkyP(b.raMax % 360.0, b.decMax))

    /** Min RA difference on the circle, degrees in [0, 180]. */
    private def raDelta(a: Double, b: Double): Double = {
      val d = math.abs(a - b) % 360.0
      math.min(d, 360.0 - d)
    }

    private def raInSeg(ra: Double, ra0: Double, ra1: Double): Boolean =
      if (ra0 <= ra1) ra >= ra0 && ra <= ra1
      else ra >= ra0 || ra <= ra1 // wraps 360→0

    /** Exact distance (deg) from `p` to the PARALLEL segment
      * (dec = d0, ra ∈ [ra0, ra1]): the separation to a point on the
      * parallel grows monotonically with |Δra|, so the closest point
      * is at p's own RA when the segment covers it, else at the
      * RA-nearer endpoint.
      */
    private def distToParallel(p: SkyP, d0: Double,
                               ra0: Double, ra1: Double): Double =
      if (raInSeg(p.ra, ra0, ra1)) math.abs(p.dec - d0)
      else {
        val e = if (raDelta(p.ra, ra0) <= raDelta(p.ra, ra1)) ra0 else ra1
        angSep(p, SkyP(e, d0))
      }

    /** Exact distance (deg) from `p` to the MERIDIAN segment
      * (ra = r0, dec ∈ [d1, d2]). cos(sep) over the segment is
      * R·cos(dec′ − φ) with φ = atan2(sin δ, cos δ·cos Δα) — the
      * cross-track foot latitude — so the minimum separation sits at
      * φ clamped into the segment or at an endpoint; evaluating all
      * three candidates is exact for every Δα (including φ beyond a
      * pole, where the interior extremum leaves [−90, 90]).
      */
    private def distToMeridian(p: SkyP, r0: Double,
                               d1: Double, d2: Double): Double = {
      val dAlpha = math.toRadians(raDelta(p.ra, r0))
      val dp = math.toRadians(p.dec)
      val foot = math.toDegrees(
        math.atan2(math.sin(dp), math.cos(dp) * math.cos(dAlpha)))
      Seq(math.max(d1, math.min(d2, foot)), d1, d2)
        .map(d => angSep(p, SkyP(r0, d))).min
    }

    /** Exact min distance (deg) from `p` to the box EDGES (the
      * region's boundary). Full-RA boxes have no meridian edges; a
      * full-RA box whose decMin sits at the (inclusive) south pole
      * has no southern boundary either.
      */
    private[spatial] def minDistToSkyboxEdges(p: SkyP, b: Skybox): Double = {
      val raSpan = if (b.raMin <= b.raMax) b.raMax - b.raMin
        else 360.0 - b.raMin + b.raMax
      val fullRa = raSpan >= 360.0 - 1e-12
      val raMaxN = b.raMax % 360.0
      val parallels =
        (if (fullRa && b.decMin <= -90.0 + 1e-12) Nil
         else Seq(distToParallel(p, b.decMin, b.raMin, b.raMax))) ++
        Seq(distToParallel(p, b.decMax, b.raMin, b.raMax))
      val meridians =
        if (fullRa) Nil
        else Seq(distToMeridian(p, b.raMin, b.decMin, b.decMax),
          distToMeridian(p, raMaxN, b.decMin, b.decMax))
      (parallels ++ meridians).min
    }

    /** Exact min distance (deg) from `p` to the box region (0 inside). */
    private[spatial] def minDistToSkybox(p: SkyP, b: Skybox): Double =
      if (b.contains(p)) 0.0 else minDistToSkyboxEdges(p, b)

    /** cone fully contains skybox: the box's FARTHEST point from the
      * cone center is within the radius. Max distance to a region is
      * 180° minus the min distance from the center's ANTIPODE — the
      * farthest point can be interior (the antipode itself), which
      * corner/edge checks alone cannot see.
      */
    def coneContainsSkybox(c: Cone, b: Skybox): Boolean = {
      val anti = SkyP((c.center.ra + 180.0) % 360.0, -c.center.dec)
      180.0 - minDistToSkybox(anti, b) <= c.radius
    }

    /** skybox contains cone: center in box and EVERY box edge at
      * least the radius away (exact edge distances — the RA/meridian
      * edges count too, not just the dec margins).
      */
    def skyboxContainsCone(b: Skybox, c: Cone): Boolean =
      b.contains(c.center) && minDistToSkyboxEdges(c.center, b) >= c.radius

    /** cone/skybox overlap: exact — the center is inside, or its min
      * distance to the box is within the radius.
      */
    def coneIntersectsSkybox(c: Cone, b: Skybox): Boolean =
      minDistToSkybox(c.center, b) <= c.radius

    def skyboxIntersectsSkybox(a: Skybox, b: Skybox): Boolean = {
      def raOverlap: Boolean = {
        def segs(x: Skybox) = if (x.raMin <= x.raMax) Seq((x.raMin, x.raMax))
          else Seq((x.raMin, 360.0), (0.0, x.raMax))
        segs(a).exists { case (a0, a1) =>
          segs(b).exists { case (b0, b1) => a0 < b1 && b0 < a1 } }
      }
      raOverlap && a.decMin < b.decMax && b.decMin < a.decMax
    }
  }
}
