package graft.units

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Unit engine (reference: python/opencosmo/units — SURVEY.md §2.11).
  *
  * A column's semantic type is a [[UnitSpec]]: a rational power product
  * of base dimensions (length, mass, velocity, time, angle) plus a
  * littleh exponent and comoving length exponent, or a Dex (log10)
  * wrapper. Unit inference runs at PLAN BUILD time over the expression
  * DSL (expr/OCExpr.scala) — mismatches throw before any job launches,
  * matching the reference's eager unit checks
  * (column/column.py:279-317). Convention changes lower to pure column
  * arithmetic (multiply by scalar or per-row scale-factor powers), so
  * Catalyst sees only ordinary expressions.
  */
object Units {

  /** Unit conventions (reference units/convention.py:7-12). */
  sealed trait Convention { def name: String }
  case object Scalefree extends Convention { val name = "scalefree" } // Mpc/h, comoving
  case object Comoving extends Convention { val name = "comoving" }   // Mpc, comoving
  case object Physical extends Convention { val name = "physical" }   // Mpc, proper
  case object Unitless extends Convention { val name = "unitless" }

  object Convention {
    def parse(s: String): Convention = s match {
      case "scalefree" => Scalefree
      case "comoving"  => Comoving
      case "physical"  => Physical
      case _           => Unitless
    }
  }

  /** A unit: power product over named base dimensions. `h` is the
    * littleh exponent (scalefree bookkeeping); `aPow` the comoving→
    * physical scale-factor power (= length exponent for distances).
    * `dex` marks log10-space quantities (reference DexUnit).
    */
  private val comovingLengthUnits = Set("Gpc", "Mpc", "kpc", "pc")

  final case class UnitSpec(dims: Map[String, Int], h: Int = 0, dex: Boolean = false) {

    def isDimensionless: Boolean = dims.isEmpty && h == 0 && !dex

    def *(o: UnitSpec): UnitSpec = {
      require(!dex && !o.dex, s"cannot multiply dex units: $this * $o")
      UnitSpec(combine(dims, o.dims, 1), h + o.h)
    }
    def /(o: UnitSpec): UnitSpec = {
      require(!dex && !o.dex, s"cannot divide dex units: $this / $o")
      UnitSpec(combine(dims, o.dims, -1), h - o.h)
    }
    def pow(p: Int): UnitSpec = {
      require(!dex, s"cannot raise dex unit: $this ** $p")
      UnitSpec(dims.map { case (k, v) => k -> v * p }, h * p)
    }
    /** add/sub require identical units (reference get_units). */
    def requireSame(o: UnitSpec, op: String): UnitSpec = {
      require(this == o, s"unit mismatch in $op: $this vs $o")
      this
    }
    /** length exponent — the scale-factor power for physical
      * conversion. Sums the PARSEC-family exponents (Gpc/Mpc/kpc/pc):
      * those are the comoving coordinate lengths that scale with a.
      * km/m/cm stay OUT deliberately — they appear in proper-unit
      * quantities (km/s peculiar velocities), which a physical
      * conversion must not rescale.
      */
    def lengthPow: Int = dims.collect {
      case (u, p) if comovingLengthUnits(u) => p
    }.sum

    override def toString: String =
      if (dex) s"dex(${UnitSpec(dims, h)})"
      else if (isDimensionless) "1"
      else {
        val parts = dims.toSeq.sortBy(_._1) ++ (if (h != 0) Seq("h" -> h) else Nil)
        parts.map { case (d, p) => if (p == 1) d else s"$d^$p" }.mkString(" ")
      }
  }

  private def combine(a: Map[String, Int], b: Map[String, Int], sign: Int): Map[String, Int] =
    (a.keySet ++ b.keySet).flatMap { k =>
      val v = a.getOrElse(k, 0) + sign * b.getOrElse(k, 0)
      if (v == 0) None else Some(k -> v)
    }.toMap

  val dimensionless: UnitSpec = UnitSpec(Map.empty)
  val rad: UnitSpec = UnitSpec(Map("rad" -> 1))
  def dexOf(u: UnitSpec): UnitSpec = UnitSpec(u.dims, u.h, dex = true)

  /** Parse "Mpc/h", "Msun/h", "km/s", "Mpc^2", "1" … into a UnitSpec.
    * Mirrors the shape of the reference's KNOWN_UNITS table
    * (units/get.py:19-40) without astropy.
    */
  def parse(s: String): UnitSpec = {
    if (s == null || s.isEmpty || s == "1" || s == "unitless") return dimensionless
    if (s.startsWith("dex(") && s.endsWith(")"))
      return dexOf(parse(s.substring(4, s.length - 1)))
    var spec = dimensionless
    // '/'-separated segments (first multiplies, later divide); within a
    // segment, whitespace-separated power factors ("Mpc^2 h^-2") —
    // round-trips UnitSpec.toString.
    s.split("/").zipWithIndex.foreach { case (seg, i) =>
      seg.trim.split("\\s+").filter(_.nonEmpty).foreach { f =>
        val u = parseFactor(f)
        spec = if (i == 0) spec * u else spec / u
      }
    }
    spec
  }

  private def parseFactor(f: String): UnitSpec = {
    val (base, p) = f.split("\\^", 2) match {
      case Array(b)     => (b.trim, 1)
      case Array(b, pw) => (b.trim, pw.trim.toInt)
    }
    val u = base match {
      case "h"   => UnitSpec(Map.empty, h = 1)
      case "1"   => dimensionless
      case other => UnitSpec(Map(other -> 1))
    }
    u.pow(p)
  }

  /** Cosmology parameters needed for conversions, plus the flat-ΛCDM
    * distance measures the reference gets from astropy
    * (cosmology.py:24-75 builds an astropy FlatLambdaCDM): standard
    * published formulae (Hogg 1999, "Distance measures in cosmology").
    */
  final case class Cosmology(h0: Double = 70.0, omegaM: Double = 0.3,
                             omegaL: Double = 0.7) {
    def littleh: Double = h0 / 100.0

    /** c/H0 in Mpc (Hubble distance). */
    def hubbleDistanceMpc: Double = 299792.458 / h0

    /** E(z) = H(z)/H0 for flat ΛCDM (radiation neglected, as the
      * reference's simulation headers do).
      */
    def efunc(z: Double): Double = {
      val zp1 = 1.0 + z
      math.sqrt(omegaM * zp1 * zp1 * zp1 + (1.0 - omegaM - omegaL) * zp1 * zp1 + omegaL)
    }

    /** Line-of-sight comoving distance D_C(z) in Mpc — Simpson's rule
      * over 1/E; 1e4 panels puts the error far below any catalog use.
      */
    def comovingDistanceMpc(z: Double): Double = {
      require(z >= 0, s"negative redshift $z")
      if (z == 0) return 0.0
      val n = 10000
      val h = z / n
      var s = 1.0 / efunc(0.0) + 1.0 / efunc(z)
      var i = 1
      while (i < n) {
        s += (if (i % 2 == 1) 4.0 else 2.0) / efunc(i * h)
        i += 1
      }
      hubbleDistanceMpc * s * h / 3.0
    }

    /** D_L = (1+z)·D_C (flat). */
    def luminosityDistanceMpc(z: Double): Double =
      (1.0 + z) * comovingDistanceMpc(z)

    /** D_A = D_C/(1+z) (flat). */
    def angularDiameterDistanceMpc(z: Double): Double =
      comovingDistanceMpc(z) / (1.0 + z)

    /** Distance modulus μ = 5·log10(D_L/10pc). */
    def distanceModulus(z: Double): Double =
      5.0 * math.log10(luminosityDistanceMpc(z) * 1e6 / 10.0)
  }

  /** Comoving-distance COLUMN over a redshift column: the integral is
    * precomputed on a dense z-grid (driver, once) and rows linearly
    * interpolate via codegen'd arithmetic over two array literals —
    * no per-row integration, no UDF. Grid spacing 1e-3 in z keeps the
    * interpolation error ≪ the integration error.
    */
  def comovingDistanceCol(zCol: Column, cosmo: Cosmology,
                          zMax: Double = 20.0): Column = {
    val n = math.max(4, (zMax * 1000).toInt)
    val dz = zMax / n
    // cumulative Simpson over uniform panels of width dz (pairwise)
    val inv = Array.tabulate(n + 1)(i => 1.0 / cosmo.efunc(i * dz))
    val cum = new Array[Double](n + 1)
    var i = 1
    while (i <= n) {
      val mid = 1.0 / cosmo.efunc((i - 0.5) * dz)
      cum(i) = cum(i - 1) + cosmo.hubbleDistanceMpc * dz / 6.0 *
        (inv(i - 1) + 4.0 * mid + inv(i))
      i += 1
    }
    val grid = lit(cum)
    val idx = least(greatest(floor(zCol / dz).cast("int"), lit(0)), lit(n - 1))
    val z0 = idx.cast("double") * dz
    val d0 = element_at(grid, idx + 1)
    val d1 = element_at(grid, idx + 2)
    d0 + (d1 - d0) * (zCol - z0) / dz
  }

  /** Convention conversion as a column transform (reference
    * units/converters.py:22-210). `unit` is the column's unit in the
    * file's BASE (scalefree) convention, e.g. Mpc/h has h exponent −1.
    *
    * Each convention's value relates to the scalefree one by a factor:
    *   F(scalefree) = 1
    *   F(comoving)  = h^{unit.h}                 (littleh divided out)
    *   F(physical)  = h^{unit.h} · a^{lengthPow} (lengths made proper)
    * so v_to = v_from · F(to)/F(from). `scaleFactor` is a literal
    * (header redshift) or per-row column — either way the result is
    * plain arithmetic, so the plan stays codegen'd.
    */
  def convert(colExpr: Column, unit: UnitSpec, from: Convention, to: Convention,
              cosmo: Cosmology, scaleFactor: Column): Column = {
    if (from == to) return colExpr
    if (unit.dex) {
      // log10-space quantity: the multiplicative factor becomes an
      // ADDITIVE log10 shift (the same algebra withUnitConversions
      // applies for dex unit changes) — silently skipping dex here
      // would leave the column in the OLD convention while the header
      // advertises the new one
      def logFactor(conv: Convention): Column = conv match {
        case Scalefree | Unitless => lit(0.0)
        case Comoving => lit(unit.h * math.log10(cosmo.littleh))
        case Physical => lit(unit.h * math.log10(cosmo.littleh)) +
          lit(unit.lengthPow.toDouble) * log10(scaleFactor)
      }
      return colExpr + logFactor(to) - logFactor(from)
    }
    def factor(conv: Convention): Column = conv match {
      case Scalefree | Unitless => lit(1.0)
      case Comoving  => lit(math.pow(cosmo.littleh, unit.h))
      case Physical  => lit(math.pow(cosmo.littleh, unit.h)) * powc(scaleFactor, unit.lengthPow)
    }
    colExpr * factor(to) / factor(from)
  }

  private def powc(c: Column, p: Int): Column =
    if (p == 0) lit(1.0) else pow(c, lit(p.toDouble))

  /** Scalar form of [[convert]]: the multiplicative factor taking a
    * value of `unit` from convention `from` to `to` at scale factor
    * `a`. Used where geometry lives on the driver (octree domains,
    * region scaling) rather than in a column expression.
    */
  def conversionFactor(unit: UnitSpec, from: Convention, to: Convention,
                       cosmo: Cosmology, a: Double): Double = {
    if (from == to) return 1.0
    // dex has no MULTIPLICATIVE factor (the shift is additive in log
    // space — see convert); geometry callers never carry dex, so a
    // silent 1.0 would hide a real conversion
    require(!unit.dex, s"no multiplicative conversion factor for dex unit $unit")
    def factor(conv: Convention): Double = conv match {
      case Scalefree | Unitless => 1.0
      case Comoving  => math.pow(cosmo.littleh, unit.h)
      case Physical  => math.pow(cosmo.littleh, unit.h) * math.pow(a, unit.lengthPow)
    }
    factor(to) / factor(from)
  }

  /** Scale factor a = 1/(1+z). */
  def scaleFactorOf(redshift: Double): Column = lit(1.0 / (1.0 + redshift))
  def scaleFactorOf(redshiftCol: Column): Column = lit(1.0) / (lit(1.0) + redshiftCol)

  // ---- per-unit conversions (reference units/handler.py:64-266) ----

  /** Known physical units: name → (dimension family, factor to the
    * family's canonical unit). Canonical: Mpc (length), Msun (mass),
    * s (time), rad (angle). Values are the CODATA/IAU constants the
    * reference gets from astropy (public physical constants).
    */
  private val MpcInMeters = 3.0856775814913673e22
  private val MsunInKg = 1.98892e30
  private val YearInSeconds = 3.1556952e7
  val unitTable: Map[String, (String, Double)] = Map(
    "Gpc" -> ("length", 1e3), "Mpc" -> ("length", 1.0),
    "kpc" -> ("length", 1e-3), "pc" -> ("length", 1e-6),
    "km" -> ("length", 1e3 / MpcInMeters), "m" -> ("length", 1.0 / MpcInMeters),
    "cm" -> ("length", 1e-2 / MpcInMeters),
    "Msun" -> ("mass", 1.0), "kg" -> ("mass", 1.0 / MsunInKg),
    "g" -> ("mass", 1e-3 / MsunInKg),
    "s" -> ("time", 1.0), "yr" -> ("time", YearInSeconds),
    "Myr" -> ("time", 1e6 * YearInSeconds), "Gyr" -> ("time", 1e9 * YearInSeconds),
    "rad" -> ("angle", 1.0), "deg" -> ("angle", math.Pi / 180.0),
    "arcmin" -> ("angle", math.Pi / 10800.0), "arcsec" -> ("angle", math.Pi / 648000.0))

  /** (family powers, combined factor to canonical units) of a spec;
    * unknown dimension names form their own family (convertible only
    * to themselves).
    */
  private def canonical(u: UnitSpec): (Map[String, Int], Double) =
    u.dims.foldLeft((Map.empty[String, Int], 1.0)) {
      case ((fams, f), (d, p)) =>
        val (fam, fac) = unitTable.getOrElse(d, (d, 1.0))
        val np = fams.getOrElse(fam, 0) + p
        (if (np == 0) fams - fam else fams.updated(fam, np), f * math.pow(fac, p))
    }

  /** Multiplicative factor converting a value in `from` to `to`
    * (dimensions must agree; the littleh exponent must match — unit
    * conversion is orthogonal to convention switching). Throws on
    * incompatible dimensions, like the reference's astropy
    * UnitConversionError.
    */
  def unitConversionFactor(from: UnitSpec, to: UnitSpec): Double = {
    require(from.h == to.h,
      s"littleh mismatch in unit conversion $from -> $to (switch convention instead)")
    require(!from.dex && !to.dex, s"dex units convert via dexShift: $from -> $to")
    val (fa, ka) = canonical(from)
    val (fb, kb) = canonical(to)
    require(fa == fb, s"incompatible units: $from -> $to ($fa vs $fb)")
    ka / kb
  }

  /** When `u` is a pure length (length¹, any littleh), the factor
    * taking values in the canonical Mpc family to values in `u` —
    * e.g. kpc → 1000. None for non-length / dimensionless /
    * compound units (a velocity coordinate has no meaningful
    * length rescale).
    */
  def lengthScaleFromMpc(u: UnitSpec): Option[Double] = {
    if (u.dex || u.dims.isEmpty) return None
    val (fams, fac) = canonical(u)
    if (fams == Map("length" -> 1)) Some(1.0 / fac) else None
  }

  /** Inverse of [[comovingDistanceCol]]: redshift from a comoving
    * distance COLUMN (Mpc). A uniform-distance z table is built once
    * on the driver by walking the forward integral; rows interpolate
    * with codegen'd arithmetic — the lookup every lightcone
    * position→redshift enrichment needs.
    */
  def redshiftFromComovingDistanceCol(dCol: Column, cosmo: Cosmology,
                                      zMax: Double = 20.0): Column = {
    val n = math.max(4, (zMax * 1000).toInt)
    val dz = zMax / n
    val cum = new Array[Double](n + 1)
    var i = 1
    while (i <= n) {
      val a = 1.0 / cosmo.efunc((i - 1) * dz)
      val m = 1.0 / cosmo.efunc((i - 0.5) * dz)
      val b = 1.0 / cosmo.efunc(i * dz)
      cum(i) = cum(i - 1) + cosmo.hubbleDistanceMpc * dz / 6.0 * (a + 4.0 * m + b)
      i += 1
    }
    val dMax = cum(n)
    val m = 20000
    val dd = dMax / m
    // invert by walking the (monotone) forward grid
    val zTab = new Array[Double](m + 1)
    var k = 0; var j = 0
    while (k <= m) {
      val target = k * dd
      while (j < n && cum(j + 1) < target) j += 1
      val lo = cum(j); val hi = if (j < n) cum(j + 1) else cum(n)
      val frac = if (hi > lo) (target - lo) / (hi - lo) else 0.0
      zTab(k) = (j + frac) * dz
      k += 1
    }
    val grid = lit(zTab)
    val idx = least(greatest(floor(dCol / dd).cast("int"), lit(0)), lit(m - 1))
    val d0 = idx.cast("double") * dd
    val z0 = element_at(grid, idx + 1)
    val z1 = element_at(grid, idx + 2)
    z0 + (z1 - z0) * (dCol - d0) / dd
  }

  /** Does `u` match conversion-map key `key`, ignoring the littleh
    * exponent? (`Map("Mpc" -> "kpc")` converts both Mpc and Mpc/h
    * columns, keeping their h bookkeeping.)
    */
  def matchesIgnoringH(u: UnitSpec, key: UnitSpec): Boolean =
    !u.dex && !key.dex && u.dims == key.dims

  /** Carry `u`'s littleh exponent onto target spec `to`. */
  def withHOf(to: UnitSpec, u: UnitSpec): UnitSpec = UnitSpec(to.dims, u.h, to.dex)
}
