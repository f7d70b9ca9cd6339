package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Stock derived-column builders (reference
  * python/opencosmo/column/stock.py:28-146 — SURVEY.md §2.5).
  * Pure `functions._` composition: codegen'd, map-side.
  */
object StockColumns {

  /** Euclidean norm over component columns (reference norm_cols). */
  def normCols(components: Column*): Column =
    sqrt(components.map(c => c * c).reduce(_ + _))

  /** Distance between two 3-D points given component column pairs
    * (reference offset_3d).
    */
  def offset3d(a: (Column, Column, Column), b: (Column, Column, Column)): Column =
    normCols(a._1 - b._1, a._2 - b._2, a._3 - b._3)

  /** Log-magnitude addition: m_tot = −2.5·log10(Σ 10^(−0.4·mᵢ))
    * (reference add_mag_cols — the one genuinely non-linear stock op).
    */
  def addMagnitudes(mags: Column*): Column = {
    val fluxes = mags.map(m => pow(lit(10.0), m * lit(-0.4)))
    lit(-2.5) * log10(fluxes.reduce(_ + _))
  }

  /** Comoving→proper-style scaling helper: x · a^p. */
  def scaleBy(x: Column, a: Column, p: Double): Column =
    if (p == 0.0) x else x * pow(a, lit(p))
}
