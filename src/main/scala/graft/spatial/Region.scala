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

  /** Cone: all points within `radius` degrees of center (reference
    * ConeRegion).
    */
  final case class Cone(center: SkyP, radius: Double) extends SkyRegion {
    def contains(p: SkyP): Boolean = angSep(center, p) <= radius

    def predicate(ra: Column, dec: Column): Column = {
      val ra1 = lit(math.toRadians(center.ra)); val de1 = lit(math.toRadians(center.dec))
      val ra2 = radians(ra); val de2 = radians(dec)
      val sd = sin((de2 - de1) / 2); val sr = sin((ra2 - ra1) / 2)
      val h = sd * sd + cos(de1) * cos(de2) * sr * sr
      val sepDeg = degrees(asin(least(lit(1.0), sqrt(h))) * 2)
      sepDeg <= lit(radius)
    }

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
    * every pair has contains/intersects). Curved-edge pairs
    * (cone↔skybox) classify by corner/center sampling, the same
    * boundary-conservative scheme the reference's healpix query uses.
    */
  object SkyRelations {
    def corners(b: Skybox): Seq[SkyP] = Seq(
      SkyP(b.raMin, b.decMin), SkyP(b.raMin, b.decMax),
      SkyP(b.raMax % 360.0, b.decMin), SkyP(b.raMax % 360.0, b.decMax))

    /** cone fully contains skybox: all corners + edge midpoints in. */
    def coneContainsSkybox(c: Cone, b: Skybox): Boolean = {
      val raMid = if (b.raMin <= b.raMax) (b.raMin + b.raMax) / 2
        else ((b.raMin + b.raMax + 360.0) / 2) % 360.0
      val samples = corners(b) ++ Seq(
        SkyP(raMid, b.decMin), SkyP(raMid, b.decMax),
        SkyP(b.raMin, (b.decMin + b.decMax) / 2),
        SkyP(b.raMax % 360.0, (b.decMin + b.decMax) / 2))
      samples.forall(c.contains)
    }

    /** skybox contains cone: center in box and box edges ≥ radius away
      * (conservative via corner/edge sampling).
      */
    def skyboxContainsCone(b: Skybox, c: Cone): Boolean =
      b.contains(c.center) &&
        corners(b).forall(p => angSep(c.center, p) >= c.radius) &&
        c.center.dec - c.radius >= b.decMin && c.center.dec + c.radius < b.decMax

    /** cone/skybox overlap: either contains the other's anchor, or a
      * sampled box boundary point lies in the cone.
      */
    def coneIntersectsSkybox(c: Cone, b: Skybox): Boolean = {
      if (b.contains(c.center)) return true
      val ras = if (b.raMin <= b.raMax)
        (0 to 8).map(i => b.raMin + (b.raMax - b.raMin) * i / 8.0)
      else (0 to 8).map(i => (b.raMin + ((b.raMax + 360.0 - b.raMin) * i / 8.0)) % 360.0)
      val decs = (0 to 8).map(i => b.decMin + (b.decMax - b.decMin) * i / 8.0)
      val boundary = ras.flatMap(r => Seq(SkyP(r, b.decMin), SkyP(r, b.decMax))) ++
        decs.flatMap(d => Seq(SkyP(b.raMin, d), SkyP(b.raMax % 360.0, d)))
      boundary.exists(c.contains)
    }

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
