package graft.io.hdf5

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Header, OCDataset}
import graft.units.Units.Cosmology

/** HDF5 ⇄ engine bridge (reference SPEC.md:1-101; io/iopen.py:80-186;
  * io/serial.py): opens reference-layout `.hdf5` files as OCDatasets /
  * StructureCollections and exports datasets back out.
  *
  * Read path is DISTRIBUTED: the driver touches only file METADATA
  * (group tree, dtypes, dims — a few KB); row data is read by Spark
  * tasks, each opening the file and reading its own row window of each
  * column — the Spark analog of the reference's per-rank HDF5 column
  * windows (io/mpi.py). On a cluster this requires the file on shared
  * storage, exactly like the reference's MPI readers.
  *
  * Import (`importDataset`) converts to the engine's native
  * parquet+sidecar layout so all downstream scans get row-group
  * pruning/pushdown; `openDataFrame` reads directly without
  * conversion for one-shot access.
  */
object Hdf5Io {

  // ---- schema (driver-side, metadata only) --------------------------

  final case class ColMeta(name: String, addr: Long, sparkType: DataType,
                           unit: String, description: String, rows: Long)

  private def sparkTypeOf(r: Hdf5Reader)(m: r.DatasetMeta): DataType = {
    val elem = m.dtype match {
      // UNSIGNED fixed-point widens to the next signed Spark type
      // (Spark has no unsigned types — the same mapping its parquet
      // reader uses), so a uint32 id of 3e9 imports as the Long 3e9,
      // never a wrapped negative. uint64 has no exact Spark home and
      // fails loudly rather than wrapping above Long.MaxValue.
      case r.FixedPoint(8, false) => Hdf5Reader.fail(
        s"unsigned 64-bit column ${m.name} has no exact Spark type — " +
          "convert to int64 (or split) before import")
      case r.FixedPoint(8, _)     => LongType
      case r.FixedPoint(4, false) => LongType
      case r.FixedPoint(4, _)     => IntegerType
      case r.FixedPoint(2, false) => IntegerType
      case r.FixedPoint(2, _)     => ShortType
      case r.FixedPoint(1, false) => ShortType
      case r.FixedPoint(1, _)     => ByteType
      case r.Floating(8)      => DoubleType
      case r.Floating(4)      => FloatType
      case _: r.FixedString   => StringType
      case r.VlenString       => StringType
      case other => Hdf5Reader.fail(s"unsupported column dtype $other for ${m.name}")
    }
    if (m.dims.size <= 1) elem else ArrayType(elem, containsNull = false)
  }

  /** data-group columns of `group` ("data" | "<ds>/data"), in stored
    * column order if the writer recorded one, else name order.
    */
  def columns(path: String, group: String = "data"): Seq[ColMeta] = {
    val r = new Hdf5Reader(path)
    try {
      val dataInfo = resolveGroup(r, group)
      val links = r.groupLinks(dataInfo)
      val metas = links.map { case (name, addr) =>
        val info = r.objectInfo(addr)
        val m = r.datasetMeta(name, info)
        ColMeta(name, addr, sparkTypeOf(r)(m),
          info.attrs.get("unit").collect { case s: String if s != "None" => s }.getOrElse(""),
          info.attrs.get("description").collect { case s: String => s }.getOrElse(""),
          m.rows)
      }
      require(metas.map(_.rows).distinct.size <= 1,
        s"ragged data group $group: ${metas.map(m => s"${m.name}=${m.rows}").mkString(", ")}")
      dataInfo.attrs.get("column_order") match {
        case Some(order: Array[Any]) =>
          val byName = metas.map(m => m.name -> m).toMap
          order.toSeq.collect { case n: String if byName.contains(n) => byName(n) } ++
            metas.filterNot(m => order.contains(m.name))
        case _ => metas
      }
    } finally r.close()
  }

  private def resolveGroup(r: Hdf5Reader, path: String): r.ObjectInfo = {
    var info = r.objectInfo(r.rootHeaderAddr)
    path.split("/").filter(_.nonEmpty).foreach { seg =>
      val links = r.groupLinks(info)
      val addr = links.collectFirst { case (n, a) if n == seg => a }
        .getOrElse(Hdf5Reader.fail(
          s"no group '$seg' in ${r.path} (have ${links.map(_._1).mkString(", ")})"))
      info = r.objectInfo(addr)
    }
    info
  }

  // ---- distributed read --------------------------------------------

  /** The data group as a DataFrame; each task reads its own row window
    * of every column straight from the file (no driver materialization,
    * no shuffle). `targetRowsPerTask` sizes the windows — tune so a
    * window's decoded rows fit comfortably in executor memory.
    */
  def openDataFrame(spark: SparkSession, path: String, group: String = "data",
                    targetRowsPerTask: Long = 1 << 18): DataFrame = {
    val cols = columns(path, group)
    require(cols.nonEmpty, s"empty data group $group in $path")
    val rows = cols.head.rows
    val schema = StructType(cols.map(c => StructField(c.name, c.sparkType)))
    val nTasks = math.max(1L, math.min(
      (rows + targetRowsPerTask - 1) / targetRowsPerTask,
      rows)).toInt
    val windows = (0 until nTasks).map { i =>
      val r0 = rows * i / nTasks; val r1 = rows * (i + 1) / nTasks
      (r0, r1)
    }.filter { case (a, b) => b > a }
    val names = cols.map(_.name)
    val rdd = spark.sparkContext
      .parallelize(windows, math.max(1, windows.size))
      .mapPartitions { it =>
        it.flatMap { case (r0, r1) => readWindow(path, group, names, r0, r1) }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** One task's slice: open the file, read [r0,r1) of each column,
    * decode column-wise, assemble rows.
    */
  private def readWindow(path: String, group: String, names: Seq[String],
                         r0: Long, r1: Long): Iterator[Row] = {
    val r = new Hdf5Reader(path)
    try {
      val dataInfo = resolveGroup(r, group)
      val links = r.groupLinks(dataInfo).toMap
      val n = (r1 - r0).toInt
      val colVals: Array[Array[Any]] = names.map { name =>
        val info = r.objectInfo(links(name))
        val m = r.datasetMeta(name, info)
        decodeColumn(r)(m, r0, r1)
      }.toArray
      (0 until n).iterator.map { i =>
        Row.fromSeq(colVals.map(_(i)).toIndexedSeq)
      }
    } finally r.close()
  }

  private def decodeColumn(r: Hdf5Reader)(m: r.DatasetMeta,
                           r0: Long, r1: Long): Array[Any] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val raw = r.readRows(m, r0, r1)
    val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    val n = (r1 - r0).toInt
    val w = m.elemsPerRow
    // vlen elements reference GCOL collections; decode each collection
    // ONCE per column read (per-element lookups re-scan the heap per
    // row — quadratic in rows on a big string column)
    val heapCache = scala.collection.mutable.Map[Long, Map[Int, Array[Byte]]]()
    def scalar(off: Int): Any = m.dtype match {
      // unsigned widens to the next signed type (matches sparkTypeOf;
      // u64 already failed loudly at schema time)
      case r.FixedPoint(8, _)     => bb.getLong(off)
      case r.FixedPoint(4, false) => bb.getInt(off).toLong & 0xFFFFFFFFL
      case r.FixedPoint(4, _)     => bb.getInt(off)
      case r.FixedPoint(2, false) => bb.getShort(off).toInt & 0xFFFF
      case r.FixedPoint(2, _)     => bb.getShort(off)
      case r.FixedPoint(1, false) => (raw(off).toInt & 0xFF).toShort
      case r.FixedPoint(1, _)     => raw(off)
      case r.Floating(8)      => bb.getDouble(off)
      case r.Floating(4)      => bb.getFloat(off)
      case r.FixedString(k)   => Hdf5Reader.cstr(java.util.Arrays.copyOfRange(raw, off, off + k))
      case r.VlenString =>
        val len = bb.getInt(off) & 0xFFFFFFFFL
        val gaddr = bb.getLong(off + 4)
        val idx = bb.getInt(off + 12)
        val obj = heapCache.getOrElseUpdate(gaddr, r.globalHeapObjects(gaddr))
          .getOrElse(idx, Hdf5Reader.fail(
            s"global heap object $idx not found at $gaddr (${m.name})"))
        // fail-loudly contract: a corrupt length larger than its heap
        // object (or than Int range — `.toInt` would wrap negative)
        // must not silently truncate to a plausible shorter string
        if (len > obj.length)
          Hdf5Reader.fail(s"vlen string length $len exceeds its " +
            s"${obj.length}-byte heap object at $gaddr[$idx] (${m.name})")
        new String(obj, 0, len.toInt, "UTF-8")
      case other => Hdf5Reader.fail(s"cannot decode $other")
    }
    val es = m.dtype.byteSize
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (m.dims.size <= 1) scalar(i * es)
        else (0 until w).map(j => scalar((i * w + j) * es))
      i += 1
    }
    out
  }

  // ---- header -------------------------------------------------------

  /** header group → engine Header. Attributes live on conventional
    * subgroups (simulation / cosmology / file), with root-group attrs
    * as a fallback; unknown attrs are ignored, required physics
    * (box_size ≥ 0, h0 > 0) is validated here rather than downstream.
    */
  def readHeader(path: String, prefix: String = ""): Header = {
    val r = new Hdf5Reader(path)
    try {
      // per-dataset header group, falling back to the file-level root
      // header (SPEC.md: multi-dataset files share one root header)
      def tryGroup(g: String): Option[Map[String, Map[String, Any]]] =
        try {
          val info = resolveGroup(r, g)
          val subs = r.groupLinks(info).map { case (n, a) => n -> r.objectInfo(a).attrs }
          Some(subs.toMap + ("" -> info.attrs))
        } catch { case _: Hdf5FormatException => None }
      val attrs: Map[String, Map[String, Any]] =
        tryGroup(s"${prefix}header")
          .orElse(if (prefix.nonEmpty) tryGroup("header") else None)
          .getOrElse(Map("" -> Map.empty[String, Any]))
      def find(name: String): Option[Any] =
        attrs.valuesIterator.flatMap(_.get(name)).toSeq.headOption
      def dbl(name: String, dflt: Double): Double = find(name) match {
        case Some(d: Double) => d
        case Some(f: Float)  => f.toDouble
        case Some(l: Long)   => l.toDouble
        case _               => dflt
      }
      def str(name: String, dflt: String): String = find(name) match {
        case Some(s: String) => s
        case _               => dflt
      }
      Header(
        boxSize = dbl("box_size", 0.0),
        redshift = dbl("redshift", 0.0),
        step = dbl("step", 0.0).toInt,
        isLightcone = find("is_lightcone").exists {
          case l: Long   => l != 0L
          case s: String => s == "true"
          case _         => false
        },
        unitConvention = str("unit_convention", "scalefree"),
        dataType = str("data_type", "dataset"),
        cosmology = Cosmology(dbl("h0", 70.0), dbl("omega_m", 0.3), dbl("omega_l", 0.7)))
        .validated
    } finally r.close()
  }

  // ---- spatial index ------------------------------------------------

  /** Deepest octree level of an `index` group as (level, starts,
    * sizes): cell i (z-order) covers data rows [starts(i),
    * starts(i)+sizes(i)) — SPEC.md's contiguous-range index.
    */
  def readIndex(path: String, prefix: String = ""): Option[(Int, Array[Long], Array[Long])] = {
    val r = new Hdf5Reader(path)
    try {
      val info =
        try resolveGroup(r, s"${prefix}index")
        catch { case _: Hdf5FormatException => return None }
      if (!info.attrs.get("index_type").contains("octtree")) return None
      val levels = r.groupLinks(info).collect {
        case (n, a) if n.startsWith("level_") => n.stripPrefix("level_").toInt -> a
      }
      if (levels.isEmpty) return None
      val (level, addr) = levels.maxBy(_._1)
      val lg = r.objectInfo(addr)
      val kids = r.groupLinks(lg).toMap
      def longs(name: String): Array[Long] = {
        val m = r.datasetMeta(name, r.objectInfo(kids(name)))
        val raw = r.readRows(m, 0, m.rows)
        val bb = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        Array.tabulate(m.rows.toInt)(i => bb.getLong(i * 8))
      }
      Some((level, longs("start"), longs("size")))
    } finally r.close()
  }

  // ---- import -------------------------------------------------------

  /** Import a single-dataset SPEC.md file into the engine: data group
    * → DataFrame, per-column `unit` attrs → header unit table, header
    * attrs → Header, and — when an octree `index` group is present —
    * the stored contiguous-range index becomes a persisted `morton_key`
    * column (each task derives its rows' cell from the broadcast range
    * table by binary search, no shuffle), so `bound()` gets the
    * stored-key pruning path immediately.
    */
  def importDataset(spark: SparkSession, h5Path: String,
                    prefix: String = ""): OCDataset = {
    val group = s"${prefix}data"
    val cols = columns(h5Path, group)
    val df0 = openDataFrame(spark, h5Path, group)
    val units = cols.collect { case c if c.unit.nonEmpty => c.name -> c.unit }.toMap
    val descs = cols.collect { case c if c.description.nonEmpty => c.name -> c.description }.toMap
    val base = readHeader(h5Path, prefix)
    readIndex(h5Path, prefix) match {
      case None =>
        OCDataset(df0, base.copy(columnUnits = units, columnDescriptions = descs))
      case Some((level, starts, sizes)) =>
        val withRow = dfWithGlobalRow(spark, h5Path, group, cols)
        val keyed = withRow.map { case (df, rowCol) =>
          mortonKeyFromRow(spark, starts, sizes, df, rowCol).drop(rowCol)
        }.get
        OCDataset(keyed, base.copy(columnUnits = units, columnDescriptions = descs,
          spatialIndexLevel = level,
          spatialIndexCoords = guessCoords(cols.map(_.name))))
    }
  }

  /** Attach the stored octree index as a `morton_key` column — a pure
    * function of the global row id via a broadcast (start, cell)
    * table: binary search the rightmost boundary ≤ row (non-empty
    * cells only, sorted by start; SPEC's z-order curve index IS the
    * key at the stored level). Shared by [[importDataset]] and
    * [[withParentRow]] so a structure parent keeps the stored-key
    * pruning path its header advertises.
    */
  private def mortonKeyFromRow(spark: SparkSession,
                               starts: Seq[Long], sizes: Seq[Long],
                               df: DataFrame, rowCol: String): DataFrame = {
    val bounds = starts.indices.collect {
      case i if sizes(i) > 0 => (starts(i), i.toLong)
    }.sortBy(_._1).toArray
    val b = spark.sparkContext.broadcast(bounds)
    val keyUdf = udf { (row: Long) =>
      val bs = b.value
      var lo = 0; var hi = bs.length - 1
      while (lo < hi) {
        val mid = (lo + hi + 1) >>> 1
        if (bs(mid)._1 <= row) lo = mid else hi = mid - 1
      }
      bs(lo)._2
    }
    df.withColumn("morton_key", keyUdf(col(rowCol)))
  }

  /** Import + convert to the native parquet+sidecar layout at
    * `outPath` (clustered by the imported morton key when present) and
    * reopen — the migration entry point: after this every query runs
    * on parquet row-group pruning.
    */
  def importToParquet(spark: SparkSession, h5Path: String, outPath: String,
                      prefix: String = ""): OCDataset = {
    val ds = importDataset(spark, h5Path, prefix)
    graft.io.OCIO.write(ds, outPath,
      sortColumn = if (ds.columns.contains("morton_key")) Some("morton_key") else None)
    graft.io.OCIO.open(spark, outPath)
  }

  /** Import a multi-dataset file (SPEC.md "Multiple OpenCosmo
    * Datasets"): `parentGroup/data_linked` start/size ranges become an
    * equality link on a synthesized parent-row column — each child
    * task binary-searches its OWN on-disk slice of the range table
    * ([[linkBoundsForWindow]]), so the link materializes map-side
    * with no shuffle and no driver-side range materialization.
    */
  def importStructure(spark: SparkSession, h5Path: String,
                      parentGroup: String): graft.collections.StructureCollection = {
    val parent = importDataset(spark, h5Path, s"$parentGroup/")
    val r = new Hdf5Reader(h5Path)
    val (links, rootGroups) =
      try {
        val li =
          try resolveGroup(r, s"$parentGroup/data_linked")
          catch { case _: Hdf5FormatException =>
            return graft.collections.StructureCollection(
              withParentRow(spark, parent, h5Path, parentGroup), Map.empty, LinkCol)
          }
        val root = r.objectInfo(r.rootHeaderAddr)
        (r.groupLinks(li).map(_._1), r.groupLinks(root).map(_._1))
      } finally r.close()
    // 1→0/1 idx links (SPEC: `<id>_idx` gives the target row, −1 =
    // none): assign the SAME link column as range links, so every
    // child joins the parent the same way.
    val idxLinks = links.filter(_.endsWith("_idx")).map(_.stripSuffix("_idx"))
    val idxChildren = idxLinks.flatMap { id =>
      rootGroups.find(g => g != parentGroup && id.startsWith(g)).map { target =>
        target -> idxLinkChild(spark, h5Path, s"$parentGroup/data_linked",
          id, s"$target/data")
      }
    }.toMap
    val startLinks = links.filter(_.endsWith("_start")).map(_.stripSuffix("_start"))
      .filter(id => links.contains(s"${id}_size"))
    val children = idxChildren ++ startLinks.flatMap { id =>
      // link id → target root group (SPEC recommends ids that extend
      // the target name with a UUID; match by prefix)
      rootGroups.find(g => g != parentGroup && id.startsWith(g)).map { target =>
        val linkGroup = s"$parentGroup/data_linked"
        val nParents = columns(h5Path, linkGroup)
          .find(_.name == s"${id}_start").map(_.rows).getOrElse(0L)
        val childCols = columns(h5Path, s"$target/data")
        target -> dfWithParentLink(spark, h5Path, s"$target/data", childCols,
          linkGroup, id, nParents)
      }
    }.toMap
    graft.collections.StructureCollection(
      withParentRow(spark, parent, h5Path, parentGroup), children, LinkCol)
  }

  val LinkCol = "__struct_row"

  /** Import a lightcone file (reference iopen.py:141-170: several
    * top-level groups, every one lightcone-typed): each group's data
    * becomes a step dataset keyed by its header `step` (falling back
    * to digits in the group name), with per-step redshifts carried —
    * redshift-range pruning then drops whole groups before any row
    * reads.
    */
  def importLightcone(spark: SparkSession, h5Path: String): graft.collections.Lightcone = {
    val r = new Hdf5Reader(h5Path)
    val groups =
      try {
        val root = r.objectInfo(r.rootHeaderAddr)
        r.groupLinks(root).map(_._1).filter(_ != "header")
      } finally r.close()
    require(groups.nonEmpty, s"no step groups in $h5Path")
    val steps = groups.zipWithIndex.map { case (g, i) =>
      val ds = importDataset(spark, h5Path, s"$g/")
      val step =
        if (ds.header.step > 0) ds.header.step
        else {
          val digits = g.filter(_.isDigit)
          if (digits.nonEmpty) digits.toInt else i
        }
      (step, g, ds.copy(header = ds.header.copy(isLightcone = true)))
    }
    // two groups resolving to one step number would silently drop a
    // whole step dataset in toMap — malformed layout fails loudly
    val dup = steps.groupBy(_._1).collectFirst { case (k, gs) if gs.size > 1 =>
      (k, gs.map(_._2)) }
    dup.foreach { case (k, gs) => Hdf5Reader.fail(
      s"step groups ${gs.mkString(", ")} all resolve to step $k in $h5Path") }
    graft.collections.Lightcone(steps.map { case (k, _, ds) => k -> ds }.toMap)
  }

  /** SPEC load-condition gate (reference iopen.py:638-657
    * `evaluate_load_conditions`): a dataset group may carry a
    * `load/if` subgroup whose attrs name boolean open-parameters; the
    * group loads iff EVERY attr matches the caller-supplied kwarg,
    * with unspecified kwargs defaulting to false. No `load/if` group →
    * always loads.
    */
  private def passesLoadConditions(r: Hdf5Reader, group: String,
                                   openKwargs: Map[String, Boolean]): Boolean = {
    val path = if (group.isEmpty) "load/if" else s"$group/load/if"
    val ifInfo =
      try Some(resolveGroup(r, path))
      catch { case _: Hdf5FormatException => None }
    ifInfo.forall(_.attrs.forall { case (key, cond) =>
      val want = cond match {
        case l: Long    => l != 0L
        case i: Int     => i != 0
        case b: Boolean => b
        case s: String  => s.equalsIgnoreCase("true")
        case _          => false
      }
      openKwargs.getOrElse(key, false) == want
    })
  }

  /** Open dispatch over a SPEC.md file (reference iopen.py:126-186):
    * root `data` group → single dataset; a group with `data_linked` →
    * structure collection (that group as parent); every group
    * lightcone-typed → lightcone; otherwise → simulation collection of
    * the datasets found. `openKwargs` feeds the SPEC `load/if`
    * condition gate — a conditionally-loaded group whose conditions
    * aren't met is skipped exactly as the reference skips it.
    *
    * DELIBERATE DIVERGENCE: for a root-level SINGLE dataset whose
    * load/if conditions are unmet, the reference silently discards it
    * and reports "no datasets found" (__make_file_target,
    * iopen.py:105-121); this import throws instead. A whole-file open
    * that yields nothing is far more likely a caller error (wrong
    * kwargs) than intent, and a loud failure names the unmet
    * condition — multi-group files keep the reference's skip
    * semantics, where partial loads are meaningful.
    */
  def importAny(spark: SparkSession, h5Path: String,
                openKwargs: Map[String, Boolean] = Map.empty): Any = {
    val r = new Hdf5Reader(h5Path)
    val (names, haveData, haveLinked, lightcone) =
      try {
        val root = r.objectInfo(r.rootHeaderAddr)
        val links = r.groupLinks(root)
        if (links.exists(_._1 == "data")) {
          require(passesLoadConditions(r, "", openKwargs),
            s"$h5Path root dataset has load conditions not met by " +
              s"openKwargs=$openKwargs")
          return importDataset(spark, h5Path)
        }
        val groups = links.filter(_._1 != "header")
          .filter { case (n, _) => passesLoadConditions(r, n, openKwargs) }
        val subs = groups.map { case (n, a) =>
          val kids = r.groupLinks(r.objectInfo(a)).map(_._1)
          (n, kids.contains("data"), kids.contains("data_linked"))
        }
        val lc = subs.nonEmpty && subs.forall(_._2) && subs.forall(!_._3) &&
          subs.exists { case (n, _, _) =>
            try {
              val hi = resolveGroup(r, s"$n/header")
              r.groupLinks(hi).exists { case (_, ha) =>
                r.objectInfo(ha).attrs.get("is_lightcone").exists {
                  case l: Long => l != 0L
                  case s: String => s == "true"
                  case _ => false
                }
              }
            } catch { case _: Hdf5FormatException => false }
          }
        (subs.map(_._1), subs.filter(_._2).map(_._1),
          subs.filter(_._3).map(_._1), lc)
      } finally r.close()
    if (haveLinked.nonEmpty) importStructure(spark, h5Path, haveLinked.head)
    else if (lightcone) importLightcone(spark, h5Path)
    else graft.collections.SimulationCollection(
      haveData.map(n => n -> importDataset(spark, h5Path, s"$n/")).toMap)
  }

  /** Export a lightcone as ONE multi-group file: each step a
    * lightcone-typed group with its own header (step + redshift), the
    * shared file header alongside — re-importable by
    * [[importLightcone]]/[[importAny]] and laid out like the
    * reference's own lightcone files.
    */
  def exportLightconeHdf5(lc: graft.collections.Lightcone, path: String,
                          chunkRows: Int = 1 << 16,
                          compress: Boolean = true): Unit = {
    // cap-check EVERY step before opening (truncating) the file
    val steps = lc.steps.toSeq.sortBy(_._1)
      .map { case (s, ds) => (s, ds, capCheckedRows(ds.getData)) }
    val w = new Hdf5Writer(path)
    try {
      val stepGrps = steps.map { case (s, ds, n) =>
        val data = writeDataGroup(w, ds.getData, ds.header, chunkRows,
          compress, n)
        val hdr = writeHeaderGroup(w,
          ds.header.copy(step = s, isLightcone = true))
        s"step_$s" -> w.writeGroup(Seq("data" -> data, "header" -> hdr))
      }
      w.finish(w.writeGroup(stepGrps))
    } catch { case e: Throwable => w.close(); throw e }
  }

  private def withParentRow(spark: SparkSession, parent: OCDataset,
                            h5Path: String, parentGroup: String): OCDataset = {
    val cols = columns(h5Path, s"$parentGroup/data")
    // re-read with the synthesized global row column; cheaper than a
    // zipWithIndex over the imported frame (windows already know their
    // global offsets)
    val (df, rowCol) = dfWithGlobalRow(spark, h5Path, s"$parentGroup/data", cols).get
    // the raw re-read lacks the morton_key importDataset derived — a
    // parent whose header advertises a spatial index must carry the
    // key column too, or bound() silently loses stored-key pruning
    val keyed = readIndex(h5Path, s"$parentGroup/").map { case (_, starts, sizes) =>
      mortonKeyFromRow(spark, starts, sizes, df, rowCol)
    }.getOrElse(df)
    parent.copy(df = keyed.withColumnRenamed(rowCol, LinkCol))
  }

  /** Map-side idx-link inversion stays driver-bounded only below
    * this parent count (a boxed Long→Long HashMap runs ~80 B/entry —
    * 1M parents ≈ 80 MB, fine; 10⁸ would be multi-GB on the driver);
    * past it the inversion becomes one distributed equality join on
    * the synthesized child-row column.
    */
  private[graft] val IdxBroadcastMaxParents: Long = 1L << 20

  /** Child frame of a 1→0/1 `<id>_idx` link, LinkCol assigned.
    * Small link tables (≤ `cap` parents) invert driver-side into a
    * broadcast map — the link materializes map-side, no shuffle.
    * Larger tables invert DISTRIBUTED: the idx column gets its own
    * global-row frame and the child left-joins on childRow — one
    * shuffle keyed on the child row, no driver materialization.
    */
  private[graft] def idxLinkChild(spark: SparkSession, h5Path: String,
      linkGroup: String, id: String, childGroup: String,
      cap: Long = IdxBroadcastMaxParents): DataFrame = {
    val childCols = columns(h5Path, childGroup)
    val (childDf, rowCol) =
      dfWithGlobalRow(spark, h5Path, childGroup, childCols).get
    val idxMeta = columns(h5Path, linkGroup).filter(_.name == s"${id}_idx")
    val nParents = idxMeta.headOption.map(_.rows).getOrElse(0L)
    if (nParents <= cap) {
      // restrict the scan to the ONE idx column (like the distributed
      // branch) — openDataFrame would decode every link dataset in the
      // group just to discard all but this column; the explicit row
      // column pins parent order independent of partition ordering
      val (idxDf, iRow) = dfWithGlobalRow(spark, h5Path, linkGroup, idxMeta).get
      val idx = idxDf.select(col(s"${id}_idx"), col(iRow)).collect()
        .sortBy(_.getLong(1)).map(_.getLong(0))
      val inverse = new java.util.HashMap[Long, Long]()
      idx.zipWithIndex.foreach { case (childRow, p) =>
        if (childRow >= 0) {
          // 1→0/1 contract: a child row referenced by two parents is a
          // layout violation — fail loudly (both regimes; the
          // containsKey probe, not put's return, because Scala unboxes
          // the returned java.lang.Long and null becomes 0L)
          if (inverse.containsKey(childRow))
            throw new IllegalStateException(
              s"${id}_idx violates the 1->0/1 idx-link contract: child " +
              s"row $childRow is referenced by more than one parent")
          inverse.put(childRow, p.toLong)
        }
      }
      val b = spark.sparkContext.broadcast(inverse)
      val pUdf = udf { (row: Long) =>
        Option(b.value.get(row)).map(_.longValue()) // unlinked → null
      }
      childDf.withColumn(LinkCol, pUdf(col(rowCol))).drop(rowCol)
    } else {
      val (linkDf, lRow) = dfWithGlobalRow(spark, h5Path, linkGroup, idxMeta).get
      // The pre-join aggregate keys the SAME shuffle the join needs
      // (Catalyst reuses the hash partitioning), and carries the
      // duplicate-target guard: the broadcast regime above fails
      // loudly on a child row with two parents, so this regime must
      // too — a plain join would silently fan the child row out. The
      // guard rides the consumed LinkCol so column pruning cannot
      // drop it.
      val inv = linkDf
        .select(col(s"${id}_idx").as("__child_row9"), col(lRow).as(LinkCol))
        .filter(col("__child_row9") >= 0)
        .groupBy(col("__child_row9"))
        .agg(count(lit(1)).as("__np9"), max(col(LinkCol)).as(LinkCol))
        .select(col("__child_row9"),
          when(col("__np9") > 1L, raise_error(concat(
            lit(s"${id}_idx violates the 1->0/1 idx-link contract: " +
              "child row "), col("__child_row9").cast("string"),
            lit(" is referenced by more than one parent"))).cast("long"))
            .otherwise(col(LinkCol)).as(LinkCol))
      childDf.join(inv, childDf(rowCol) === inv("__child_row9"), "left")
        .drop("__child_row9", rowCol)
    }
  }

  /** Per-task slice of a start/size range-link table: binary-searches
    * the ON-DISK `<id>_start` column for the parent-index range
    * overlapping child rows [r0, r1), then reads just that slice of
    * (start, size). SPEC layout guarantee this leans on: child rows
    * are stored contiguously in parent order, so starts are
    * nondecreasing (the Hdf5Spec fixture builds them with scanLeft,
    * as the reference writer does) — verified per slice, loud failure
    * on violation. This replaces a driver-side collect of ALL parent
    * ranges (multi-GB on the driver at 10⁸ structures): each task now
    * holds only the ranges its own rows can belong to, found with
    * O(log nParents) single-element windowed reads.
    *
    * Returns (start, size, parentRow) for the slice's non-empty
    * ranges, in start order. Empty ranges may tie on start with a
    * following real range; the lower bound rewinds over the tie run
    * (second binary search) so a real range is never skipped.
    */
  private[graft] def linkBoundsForWindow(path: String, linkGroup: String,
      id: String, nParents: Long, r0: Long, r1: Long): Array[(Long, Long, Long)] = {
    if (nParents <= 0) return Array.empty
    val r = new Hdf5Reader(path)
    try {
      val info = resolveGroup(r, linkGroup)
      val links = r.groupLinks(info).toMap
      val sMeta = r.datasetMeta(s"${id}_start", r.objectInfo(links(s"${id}_start")))
      val zMeta = r.datasetMeta(s"${id}_size", r.objectInfo(links(s"${id}_size")))
      def startAt(i: Long): Long =
        decodeColumn(r)(sMeta, i, i + 1)(0).asInstanceOf[Number].longValue
      // largest parent with start ≤ r0 (only the nearest preceding
      // range can cover r0 — ranges are non-overlapping)
      var lo = 0L; var hi = nParents - 1
      while (lo < hi) {
        val mid = (lo + hi + 1) >>> 1
        if (startAt(mid) <= r0) lo = mid else hi = mid - 1
      }
      // rewind over a tie run (empty ranges share the next range's
      // start): first parent whose start equals startAt(lo)
      val s0 = startAt(lo)
      var a = 0L; var b = lo
      while (a < b) {
        val mid = (a + b) >>> 1
        if (startAt(mid) < s0) a = mid + 1 else b = mid
      }
      val p0 = a
      // smallest parent with start ≥ r1 (its rows are all ≥ r1)
      var lo2 = p0; var hi2 = nParents
      while (lo2 < hi2) {
        val mid = (lo2 + hi2) >>> 1
        if (startAt(mid) < r1) lo2 = mid + 1 else hi2 = mid
      }
      val p1 = lo2
      val starts = decodeColumn(r)(sMeta, p0, p1)
      val sizes = decodeColumn(r)(zMeta, p0, p1)
      var prev = Long.MinValue
      starts.foreach { s =>
        val v = s.asInstanceOf[Number].longValue
        require(v >= prev,
          s"non-monotonic ${id}_start near parent row $p0 in $path — " +
            "SPEC contiguous-layout violated; refusing to mis-link")
        prev = v
      }
      starts.indices.collect {
        case i if sizes(i).asInstanceOf[Number].longValue > 0 =>
          (starts(i).asInstanceOf[Number].longValue,
            sizes(i).asInstanceOf[Number].longValue, p0 + i)
      }.toArray
    } finally r.close()
  }

  /** openDataFrame + the range-link parent column, assigned
    * TASK-LOCALLY: each read window resolves only its own slice of
    * the link table via [[linkBoundsForWindow]] — no driver collect,
    * no whole-table broadcast, link still materializes map-side.
    * Rows in a gap between ranges belong to no parent — assigning
    * them to the preceding one would be silent corruption; they get a
    * null link instead.
    */
  /** Even [r0, r1) read windows over `rows` at a ~256k-row budget per
    * task — the ONE sizing definition both window-parallel readers
    * below split with, so a budget change cannot leave the two paths
    * splitting differently.
    */
  private def readWindows(rows: Long): Seq[(Long, Long)] = {
    val per = 1L << 18
    val nTasks = math.max(1L, math.min((rows + per - 1) / per, rows)).toInt
    (0 until nTasks).map { i =>
      (rows * i / nTasks, rows * (i + 1) / nTasks)
    }.filter { case (a, b) => b > a }
  }

  private def dfWithParentLink(spark: SparkSession, path: String, group: String,
      cols: Seq[ColMeta], linkGroup: String, id: String,
      nParents: Long): DataFrame = {
    val rows = cols.head.rows
    val schema = StructType(
      cols.map(c => StructField(c.name, c.sparkType)) :+ StructField(LinkCol, LongType))
    val windows = readWindows(rows)
    val names = cols.map(_.name)
    val rdd = spark.sparkContext.parallelize(windows, math.max(1, windows.size))
      .mapPartitions { it =>
        it.flatMap { case (w0, w1) =>
          val bs = linkBoundsForWindow(path, linkGroup, id, nParents, w0, w1)
          readWindow(path, group, names, w0, w1).zipWithIndex.map { case (row, i) =>
            val gr = w0 + i
            var lo = 0; var hi = bs.length - 1
            while (lo < hi) {
              val mid = (lo + hi + 1) >>> 1
              if (bs(mid)._1 <= gr) lo = mid else hi = mid - 1
            }
            val parent: Any =
              if (bs.nonEmpty && bs(lo)._1 <= gr && gr < bs(lo)._1 + bs(lo)._2)
                bs(lo)._3
              else null
            Row.fromSeq(row.toSeq :+ parent)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** openDataFrame + a deterministic global row-number column — free,
    * because each window knows its absolute start row (no
    * zipWithIndex/shuffle).
    */
  private def dfWithGlobalRow(spark: SparkSession, path: String, group: String,
                              cols: Seq[ColMeta]): Option[(DataFrame, String)] = {
    val rows = cols.head.rows
    val schema = StructType(
      cols.map(c => StructField(c.name, c.sparkType)) :+ StructField(RowCol, LongType))
    val windows = readWindows(rows)
    val names = cols.map(_.name)
    val rdd = spark.sparkContext.parallelize(windows, math.max(1, windows.size))
      .mapPartitions { it =>
        it.flatMap { case (r0, r1) =>
          readWindow(path, group, names, r0, r1).zipWithIndex.map {
            case (row, i) => Row.fromSeq(row.toSeq :+ (r0 + i))
          }
        }
      }
    Some((spark.createDataFrame(rdd, schema), RowCol))
  }
  private val RowCol = "__h5_row"

  private def guessCoords(names: Seq[String]): Seq[String] = {
    Seq(Seq("x", "y", "z"), Seq("fof_halo_center_x", "fof_halo_center_y", "fof_halo_center_z"))
      .find(_.forall(names.contains)).getOrElse(Nil)
  }

  // ---- export -------------------------------------------------------

  /** Export an OCDataset as a SPEC.md-layout HDF5 file: `data/` column
    * datasets (with `unit`/`description` attrs and a `column_order`
    * attr for order-stable round trips), `header/` attribute groups.
    * Interchange path: column data streams through the driver one
    * partition at a time (`toLocalIterator`), one pass per column —
    * HDF5 is a single-writer format, so this is inherently a
    * driver-bound export, like the reference's serial writer
    * (io/serial.py). Use parquet for engine-to-engine data movement.
    * REFUSES past `spark.graft.hdf5.exportMaxRows` (default
    * [[ExportMaxRows]]) rather than silently serializing a
    * cluster-sized frame through one JVM — see the cap's doc.
    *
    * HDF5 has no null representation: null numerics export as zero
    * and null strings as "" (the reference's files simply never
    * contain nulls). NaN/±Inf round-trip bit-exactly (raw IEEE
    * bytes).
    */
  def exportHdf5(ds: OCDataset, path: String,
                 chunkRows: Int = 1 << 16, compress: Boolean = true): Unit = {
    // cap-check BEFORE opening (truncating) the destination file
    val nRows = capCheckedRows(ds.getData)
    val w = new Hdf5Writer(path)
    try {
      val dataAddr = writeDataGroup(w, ds.getData, ds.header, chunkRows,
        compress, nRows)
      val headerAddr = writeHeaderGroup(w, ds.header)
      w.finish(w.writeGroup(Seq("data" -> dataAddr, "header" -> headerAddr)))
    } catch { case e: Throwable => w.close(); throw e }
  }

  /** Interop-scale row cap for the driver-funneled HDF5 export paths.
    * `toLocalIterator` keeps driver MEMORY flat (one partition at a
    * time), so unlike `objects()` this is not an OOM guard — it bounds
    * WALL TIME: HDF5 is a single-writer format, so every exported row
    * serializes through one JVM one column at a time, and a user
    * pointing `exportHdf5` at a cluster-sized frame would wait hours
    * for what `oc.write` (Parquet + sidecar, all executors writing)
    * finishes in seconds. Overridable per session via
    * `spark.graft.hdf5.exportMaxRows` when the serial wait is an
    * explicit choice.
    */
  val ExportMaxRows: Long = 100000000L

  /** Count `df` and refuse past the interop cap (see
    * [[ExportMaxRows]]). MUST run before the export's `Hdf5Writer` is
    * constructed: the writer truncates an existing file at the path,
    * so a refusal after construction would destroy a prior good
    * export while telling the user to use `oc.write`. Every export
    * entry point cap-checks ALL of its frames through this funnel
    * first, then opens the file. Returns the counted rows so the
    * write pass reuses them.
    */
  private def capCheckedRows(df: DataFrame): Long = {
    val rows = df.count()
    val cap = df.sparkSession.conf
      .get("spark.graft.hdf5.exportMaxRows", ExportMaxRows.toString).toLong
    require(rows <= cap,
      s"HDF5 export would stream $rows rows through the driver (cap $cap). " +
        "HDF5 is a single-writer interop format — every row serializes " +
        "through one JVM. Use oc.write (Parquet + sidecar, fully " +
        "distributed) for engine-scale data movement, or set " +
        "spark.graft.hdf5.exportMaxRows higher if the serial export " +
        "time is an explicit choice.")
    rows
  }

  /** Stream a DataFrame into a `data` group (one pass per column);
    * returns the group's object-header address. `rows` is the
    * caller's [[capCheckedRows]] result — the cap has already been
    * enforced before the writer opened.
    */
  private def writeDataGroup(w: Hdf5Writer, df: DataFrame, header: Header,
                             chunkRows: Int, compress: Boolean,
                             rows: Long): Long = {
    import Hdf5Writer._
    // one job probes every string column's max byte width + array widths
    val strCols = df.schema.fields.filter(_.dataType == StringType).map(_.name)
    val arrCols = df.schema.fields.collect { case f if f.dataType.isInstanceOf[ArrayType] => f.name }
    val probes = strCols.map(c => max(octet_length(col(c))).as(s"s_$c")) ++
      arrCols.map(c => max(size(col(c))).as(s"a_$c"))
    val probeRow = if (probes.isEmpty) null else df.agg(probes.head, probes.tail.toSeq: _*).head()
    val strW = strCols.map(c => c -> (Option(probeRow.getAs[Any](s"s_$c"))
      .fold(1)(_.asInstanceOf[Number].intValue) + 1)).toMap
    // empty frames probe null widths — zero-width arrays are legal
    val arrW = arrCols.map(c => c -> Option(probeRow.getAs[Any](s"a_$c"))
      .fold(0)(_.asInstanceOf[Number].intValue)).toMap
    val colAddrs = df.schema.fields.map { f =>
      val (dt, dims) = f.dataType match {
        case LongType    => (I64, Seq(rows))
        case IntegerType => (I32, Seq(rows))
        case DoubleType  => (F64, Seq(rows))
        case FloatType   => (F32, Seq(rows))
        case StringType  => (Str(strW(f.name)), Seq(rows))
        case ArrayType(DoubleType, _) => (F64, Seq(rows, arrW(f.name).toLong))
        case ArrayType(FloatType, _)  => (F32, Seq(rows, arrW(f.name).toLong))
        case ArrayType(LongType, _)   => (I64, Seq(rows, arrW(f.name).toLong))
        case other => throw new IllegalArgumentException(
          s"exportHdf5: unsupported column type $other (${f.name})")
      }
      val attrs =
        header.columnUnits.get(f.name).map("unit" -> _).toSeq ++
        header.columnDescriptions.get(f.name).map("description" -> _).toSeq
      import scala.jdk.CollectionConverters._
      val it = df.select(col(f.name)).toLocalIterator().asScala
        .map(r => encodeValue(dt, f.dataType, r.get(0), strW.get(f.name), arrW.get(f.name)))
      val addr = w.writeDataset(dt, dims, it, attrs,
        chunkRows = if (compress) math.min(chunkRows.toLong, math.max(1L, rows)).toInt else 0,
        deflate = compress, shuffle = compress && !dt.isInstanceOf[Str])
      f.name -> addr
    }
    w.writeGroup(colAddrs.toSeq,
      attrs = Seq("column_order" -> df.schema.fieldNames.toSeq))
  }

  private def writeHeaderGroup(w: Hdf5Writer, h: Header): Long = {
    val sim = w.writeGroup(Nil, Seq(
      "box_size" -> h.boxSize, "redshift" -> h.redshift, "step" -> h.step.toLong))
    val cos = w.writeGroup(Nil, Seq(
      "h0" -> h.cosmology.h0, "omega_m" -> h.cosmology.omegaM,
      "omega_l" -> h.cosmology.omegaL))
    val fil = w.writeGroup(Nil, Seq(
      "unit_convention" -> h.unitConvention, "data_type" -> h.dataType,
      "is_lightcone" -> (if (h.isLightcone) 1L else 0L)))
    w.writeGroup(Seq("simulation" -> sim, "cosmology" -> cos, "file" -> fil))
  }

  /** Export a structure collection as ONE multi-dataset SPEC.md file:
    *
    *   /<parent>/data            parent columns, sorted by link key
    *   /<parent>/data_linked     <child>_start / <child>_size ranges
    *   /<child>/data             child columns, clustered by link key
    *   /header                   shared file-level header
    *
    * The contiguous-range link the reference stores natively is
    * RECONSTRUCTED here from the equality link: children sort by the
    * link key (one cluster per parent), per-parent counts join against
    * the sorted parent, and starts are the running sum of sizes —
    * folded over a partition-at-a-time stream of the sorted
    * one-row-per-parent frame, so the driver never materializes the
    * whole link table even at 10⁸ parents.
    */
  def exportStructureHdf5(coll: graft.collections.StructureCollection,
                          path: String,
                          parentName: String = "structure_properties",
                          chunkRows: Int = 1 << 16,
                          compress: Boolean = true): Unit = {
    import org.apache.spark.sql.graftshim.DiskSnapshot
    val key = coll.linkKey
    // parent keys must be unique — the start/size reconstruction
    // needs exactly one parent row per key
    val Array(nRows, nKeys) = coll.properties.df
      .agg(count(lit(1)), countDistinct(col(key))).head().toSeq
      .map(_.asInstanceOf[Long]).toArray
    require(nRows == nKeys,
      s"exportStructureHdf5 needs unique $key values ($nKeys distinct of $nRows rows)")
    // the export streams each column in its OWN job, so every frame it
    // iterates must be MATERIALIZED once (eager disk snapshot): a
    // bare orderBy would re-execute per column, and within-key tie
    // order after a shuffle is not stable across executions — child
    // rows (many per parent: the key is deliberately non-unique there)
    // could silently misalign across columns. Snapshot blocks are
    // fixed once, so every per-column pass reads the same rows in the
    // same order; the sort also prices once instead of per column.
    val parentSorted = DiskSnapshot.diskCachedEager(
      coll.properties.df.orderBy(col(key)))
    val childSorted = coll.children.toSeq.map { case (name, child) =>
      name -> DiskSnapshot.diskCachedEager(child.orderBy(col(key)))
    }
    // cap-check parent AND every child before opening (truncating)
    // the file — a refusal must never leave a half-written or
    // destroyed multi-table file behind
    capCheckedRows(parentSorted)
    val childRows = childSorted
      .map { case (name, child) => name -> capCheckedRows(child) }.toMap
    val w = new Hdf5Writer(path)
    try {
      val parentData = writeDataGroup(w, parentSorted, coll.properties.header,
        chunkRows, compress, nRows)
      val linkAddrs = childSorted.map { case (name, child) =>
        // per-parent sizes in parent (key-sorted) order, 0 for
        // childless. STREAMED to the writer partition-at-a-time
        // (toLocalIterator over the sorted frame — partition order is
        // global order after a range sort): the driver never holds
        // more than one partition of the (one row per parent) frame,
        // so a 10⁸-structure export stays flat-memory even though the
        // file itself is written by one process. The running-prefix
        // starts fold over the same stream.
        import scala.jdk.CollectionConverters._
        val counts = child.groupBy(col(key)).agg(count(lit(1)).as("__n"))
        val sizesDf = parentSorted.select(col(key))
          .join(counts, Seq(key), "left")
          .orderBy(col(key))
          .select(coalesce(col("__n"), lit(0L)).as("__sz"))
          .persist() // consumed twice: starts pass, then sizes pass
        def szIter = sizesDf.toLocalIterator().asScala.map(_.getLong(0))
        def i64(vals: Iterator[Long]) = w.writeDataset(Hdf5Writer.I64,
          Seq(nRows),
          vals.grouped(1 << 16).map { g =>
            val b = java.nio.ByteBuffer.allocate(8 * g.length)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            g.foreach(b.putLong); b.array()
          })
        var acc = 0L
        val starts = i64(szIter.map { s => val st = acc; acc += s; st })
        val sizes = i64(szIter)
        sizesDf.unpersist()
        Seq(s"${name}_start" -> starts, s"${name}_size" -> sizes)
      }
      val dataLinked = w.writeGroup(linkAddrs.flatten)
      val parentGrp = w.writeGroup(
        Seq("data" -> parentData, "data_linked" -> dataLinked))
      val childGrps = childSorted.map { case (name, child) =>
        val childData = writeDataGroup(w, child,
          Header(), chunkRows, compress, childRows(name))
        name -> w.writeGroup(Seq("data" -> childData))
      }
      val headerAddr = writeHeaderGroup(w,
        coll.properties.header.copy(dataType = "structure"))
      w.finish(w.writeGroup(
        (parentName -> parentGrp) +: childGrps :+ ("header" -> headerAddr)))
    } catch { case e: Throwable => w.close(); throw e }
  }

  private def encodeValue(dt: Hdf5Writer.WDType, st: DataType, v: Any,
                          strW: Option[Int], arrW: Option[Int]): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    import Hdf5Writer._
    def one(b: ByteBuffer, x: Any): Unit = (dt, x) match {
      case (I64, l: Long)   => b.putLong(l)
      case (I32, i: Int)    => b.putInt(i)
      case (F64, d: Double) => b.putDouble(d)
      case (F32, f: Float)  => b.putFloat(f)
      case (Str(k), s: String) =>
        val sb = s.getBytes("UTF-8")
        b.put(sb); b.put(new Array[Byte](k - sb.length))
      case (_, null) => b.put(new Array[Byte](dt.size)) // null → zero row
      case other => throw new IllegalArgumentException(s"encode mismatch: $other")
    }
    st match {
      case _: ArrayType =>
        val wdt = arrW.get
        // a NULL array cell exports as a zero row, same as scalar
        // nulls (HDF5 has no null representation) — matching on the
        // Seq first would NPE mid-export
        if (v == null) return new Array[Byte](dt.size * wdt)
        val seq = v.asInstanceOf[scala.collection.Seq[Any]]
        val b = ByteBuffer.allocate(dt.size * wdt).order(ByteOrder.LITTLE_ENDIAN)
        seq.foreach(x => one(b, x))
        (seq.size until wdt).foreach(_ => b.put(new Array[Byte](dt.size)))
        b.array()
      case _ =>
        val b = ByteBuffer.allocate(dt.size).order(ByteOrder.LITTLE_ENDIAN)
        one(b, v)
        b.array()
    }
  }
}
