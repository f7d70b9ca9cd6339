package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType
import graft.core.{Header, OCDataset}

/** Read/write path (reference python/opencosmo/io — SURVEY.md §2.1).
  *
  * Storage layout: one directory per dataset —
  *   <path>/data.parquet/   columnar data (Parquet ≈ the reference's
  *                          per-column HDF5 `data/` group; row-group
  *                          stats give the same min/max windowing)
  *   <path>/_header.json    header sidecar (≈ HDF5 `header/` group)
  * The reference's MPI-parallel writer (io/mpi.py, 517 LoC) dissolves:
  * `df.write.parquet` is already a cluster-parallel columnar write.
  */
object OCIO {

  /** Write dataset + header sidecar. `sortColumn` optionally clusters
    * rows within files (e.g. by Morton key) so spatial row-group
    * pruning works on re-read — the Spark analog of the reference
    * writing in storage order to keep its tree index valid
    * (handler.py:330-350).
    */
  def write(ds: OCDataset, path: String, sortColumn: Option[String] = None): Unit = {
    val d = sortColumn.fold(ds.df)(c => ds.df.sortWithinPartitions(col(c)))
    d.write.mode("overwrite").parquet(s"$path/data.parquet")
    Header.write(path, ds.header)
  }

  /** Open a dataset directory written by [[write]]. `hooks` are
    * open-time enrichment functions (the Spark analog of the
    * reference's DatasetOpen/Instantiate plugin hook points,
    * plugins/hook.py:15-71 — e.g. synthesizing redshift/ra/dec
    * columns at open, collection/lightcone/plugins.py:20-108).
    */
  def open(spark: SparkSession, path: String,
           hooks: Seq[OCDataset => OCDataset] = Nil): OCDataset = {
    val header = Header.read(path)
    val ds = OCDataset(spark.read.parquet(s"$path/data.parquet"), header)
    hooks.foldLeft(ds)((d, h) => h(d))
  }

  /** Round-trip-stable parquet export that flattens multi-dimensional
    * (array) columns into `name_0 … name_k` scalar columns — reference
    * write_parquet (io/parquet.py:18-90). `widths` gives each array
    * column's fixed width (from its first row when omitted).
    */
  def exportParquetFlat(df: DataFrame, path: String,
                        widths: Map[String, Int] = Map.empty): Unit =
    flatten(df, widths).write.mode("overwrite").parquet(path)

  def flatten(df: DataFrame, widths: Map[String, Int] = Map.empty): DataFrame = {
    val cols = df.schema.fields.flatMap { f =>
      f.dataType match {
        case _: ArrayType =>
          val w = widths.getOrElse(f.name,
            df.select(size(col(f.name))).first().getInt(0))
          (0 until w).map(i => col(f.name).getItem(i).as(s"${f.name}_$i"))
        case _ => Seq(col(f.name))
      }
    }
    df.select(cols.toSeq: _*)
  }
}
