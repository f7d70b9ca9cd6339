package graft.functions

import org.apache.spark.sql.functions._
import graft.core.OCDataset
import graft.units.Units

/** Observer-frame geometry from comoving positions — the computation
  * the reference's lightcone plugin hooks perform at open time
  * (collection/lightcone/plugins.py:20-108: synthesize `redshift`,
  * `ra`, `dec` from x/y/z): radial comoving distance → redshift via
  * the inverse LCDM lookup, direction → (ra, dec). All codegen'd
  * column arithmetic; register through `OCIO.Hooks` to enrich every
  * open of a data type, exactly like the reference's plugin
  * registration.
  */
object SkyGeometry {

  /** Add `ra` (deg, [0,360)), `dec` (deg), `r_c_mpc` (comoving radius)
    * and `redshift` columns derived from observer-centered comoving
    * coordinates in Mpc.
    */
  def withSkyCoords(ds: OCDataset,
                    coords: (String, String, String) = ("x", "y", "z")): OCDataset = {
    val (x, y, z) = coords
    val r = sqrt(col(x) * col(x) + col(y) * col(y) + col(z) * col(z))
    val ra = pmod(degrees(atan2(col(y), col(x))) + lit(360.0), lit(360.0))
    val dec = degrees(asin(col(z) / r))
    val out = ds.df
      .withColumn("r_c_mpc", r)
      .withColumn("ra", ra)
      .withColumn("dec", when(col("r_c_mpc") > 0, dec).otherwise(lit(0.0)))
      .withColumn("redshift",
        Units.redshiftFromComovingDistanceCol(col("r_c_mpc"), ds.header.cosmology))
    ds.copy(df = out, header = ds.header.copy(columnUnits =
      ds.header.columnUnits ++ Map("r_c_mpc" -> "Mpc", "ra" -> "deg", "dec" -> "deg")))
  }

  /** The plugin form: a hook you can register for a data type —
    * `OCIO.Hooks.register("lightcone")(SkyGeometry.hook())`.
    */
  def hook(coords: (String, String, String) = ("x", "y", "z")): OCDataset => OCDataset =
    withSkyCoords(_, coords)
}
