package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Arrow IPC export — the zero-copy columnar handoff a training-data
  * consumer (dataloader, feature store) wants instead of `collect()`.
  * This is the one defensible residue of the reference's Python
  * output-format surface (reference python/opencosmo/dataset/
  * formats.py:14-120 — astropy/pandas/polars/arrow/jax all accept
  * Arrow IPC); the remaining five formats are one `pyarrow.ipc.open_
  * stream` away on the consumer side.
  *
  * Scale shape: each partition writes its OWN IPC stream file where
  * its rows already sit — no driver collect, no shuffle, linear in
  * partition data; at 1000 executors this is 1000 concurrent
  * independent writers, the same layout parquet export uses. Files
  * are self-describing (schema travels in-stream), so a consumer maps
  * shards to dataloader workers directly. Shard I/O goes through the
  * Hadoop FileSystem API with the session's Hadoop configuration
  * (broadcast to tasks), so `outDir` may be any filesystem the
  * cluster shares — HDFS, S3, or a local path in local mode; each
  * task creates the directory on ITS filesystem before writing, and
  * commits its shard via temp-name + rename so task kills, retries,
  * and speculative twins never expose a truncated file under a final
  * shard name.
  *
  * Uses only the PUBLIC arrow-vector API (bundled with Spark — the
  * same batches Spark itself speaks to pandas-on-Spark consumers);
  * no Spark-internal Arrow plumbing.
  *
  * Supported column types: boolean, int, long, float, double, string,
  * binary, date, timestamp, arrays of int/long/float/double/string
  * (embedding and token-array columns; inner nulls round-trip), flat
  * structs of those scalars (the typed-metadata shape multimodal
  * columns carry), arrays of such flat structs (the per-frame /
  * per-segment metadata list a video or audio column carries — one
  * nesting level), arrays OF arrays of those scalars (the packed-batch
  * shape a dataloader consumes: one bin row carrying each packed doc's
  * own token-id list; null inner lists and null elements travel), and
  * string-keyed maps with scalar values (the event-properties shape;
  * null values travel, keys are non-null by Arrow's map contract).
  * Anything else throws up front with the column name — cast or
  * digest it first.
  *
  * Determinism caveat (shard identity under retries): a retried or
  * speculative task re-runs the partition and must produce the SAME
  * bytes for the commit protocol's "loser defers to committed winner"
  * step to be exact. Spark partition CONTENT is deterministic per
  * partition id under fixed input, but row ORDER after a round-robin
  * `repartition(n)` or an unordered shuffle is not guaranteed stable
  * across attempts — the committed winner then holds the same row SET
  * in a possibly different order. If byte-identical shards matter to
  * the consumer, export frames whose partitioning is deterministic
  * (source partitions, hash-partitioned keys, or sortWithinPartitions)
  * or disable speculation for the write job.
  */
object ArrowExport {

  /** Write `df` as Arrow IPC stream files under `outDir`
    * (`part-NNNNN.arrow`, one per non-empty partition). Returns the
    * written file paths in partition order. `batchRows` bounds the
    * rows per Arrow record batch (consumer-side memory granularity).
    */
  def writeArrowIpc(df: DataFrame, outDir: String,
                    batchRows: Int = 1 << 14): Seq[String] = {
    require(batchRows >= 1, s"batchRows must be >= 1, got $batchRows")
    val schema = df.schema
    schema.fields.foreach(f => checkSupported(f.name, f.dataType))
    val sc = df.sparkSession.sparkContext
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      sc.hadoopConfiguration)
    // driver-side mkdir so an EMPTY frame still exports a valid
    // (empty) directory; tasks re-create on their own filesystem view.
    // Overwrite semantics: sweep our OWN artifacts from a previous
    // export first — final shards (a prior run with MORE partitions
    // would otherwise leave stale part files the reader's glob picks
    // up, and rename-refusing filesystems like HDFS would silently
    // keep a stale shard over this run's), checksum sidecars, and any
    // orphaned .inprogress temps a crashed executor left behind (the
    // sweep bounds their lifetime to one run). Nothing else in the
    // directory is touched.
    val dirPath = new org.apache.hadoop.fs.Path(outDir)
    val dfs = dirPath.getFileSystem(hconf.value)
    dfs.mkdirs(dirPath)
    Seq("part-*.arrow", ".part-*.arrow.*").foreach { pat =>
      dfs.globStatus(new org.apache.hadoop.fs.Path(dirPath, pat))
        .foreach(st => dfs.delete(st.getPath, false))
    }
    val bc = sc.broadcast(hconf)
    // InternalRow export (r20, guide §4): `df.rdd` deserialized EVERY
    // exported row to an external Row (one boxed object per value)
    // before the writer re-read it; the writer now consumes the
    // UnsafeRows directly — typed accessors, no conversion pass, same
    // bytes on disk (ArrowExportSpec round-trips every supported type).
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.toRdd.mapPartitionsWithIndex { (pid, rows) =>
      if (!rows.hasNext) Iterator.empty
      else {
        val dir = new org.apache.hadoop.fs.Path(outDir)
        val fs = dir.getFileSystem(bc.value.value)
        fs.mkdirs(dir)
        // task-commit protocol: write to a dot-prefixed attempt-scoped
        // temp name, rename into place only after a clean close. A
        // killed task never leaves a truncated file under the final
        // name, a retried task replaces (deterministic content), and a
        // speculative twin that loses the rename race defers to the
        // committed winner. The temp name fails the reader's *.arrow
        // glob, so an in-progress shard is invisible to consumers.
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val fin = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.arrow")
        val tmp = new org.apache.hadoop.fs.Path(dir,
          f".part-$pid%05d.arrow.inprogress-$attempt")
        var ok = false
        try {
          writePartition(schema, rows, fs.create(tmp, true), batchRows)
          ok = true
        } finally if (!ok) {
          try fs.delete(tmp, false)
          catch { case _: Throwable => () } // best-effort; rethrow wins
        }
        commitShard(fs, tmp, fin)
        Iterator.single(f"$outDir/part-$pid%05d.arrow")
      }
    }.collect().toSeq.sorted
  }

  /** Distributed Arrow IPC import: every `part-*.arrow` under `dir`
    * read where it sits — one Spark task per shard file, no driver
    * collect — into a DataFrame with the given schema (the export is
    * self-describing, but Spark needs the schema before tasks run;
    * pass the frame's schema or a pruned subset of its columns).
    * Inverse of [[writeArrowIpc]] over the same supported types.
    *
    * Moves BATCH-WISE: each loaded Arrow record batch is wrapped as a
    * Spark `ColumnarBatch` over `ArrowColumnVector`s (zero-copy view
    * of the Arrow buffers) and compacted to `UnsafeRow`s by ONE
    * codegen'd projection — no per-value boxing, no per-value type
    * dispatch, no external-`Row` round trip. (The round-14 form built
    * a `Row.fromSeq` per record with a type `match` per value, then
    * paid the encoder again inside `createDataFrame`.)
    */
  def readArrowIpcDF(spark: org.apache.spark.sql.SparkSession,
                     dir: String, schema: StructType): DataFrame = {
    schema.fields.foreach(f => checkSupported(f.name, f.dataType))
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(hconf.value)
    require(fs.exists(dirPath), s"Arrow shard directory $dir does not exist")
    val files = fs.globStatus(new org.apache.hadoop.fs.Path(dirPath, "*.arrow"))
      .map(_.getPath.toString).toSeq.sorted
    val bc = spark.sparkContext.broadcast(hconf)
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.length))
      .flatMap(path => shardInternalIterator(path, schema, bc.value.value))
    org.apache.spark.sql.graftshim.DiskSnapshot
      .dfFromInternalRows(spark, rdd, schema)
  }

  /** Streaming per-shard batch-wise iterator: one Arrow record batch
    * in memory at a time (the write-side `batchRows` granularity is
    * the read-side peak too — a multi-GB shard never materializes),
    * surfaced to Spark as `UnsafeRow`s via a columnar-batch view plus
    * one codegen'd projection. Resources close at exhaustion AND at
    * task completion, so a short-circuiting consumer (limit) doesn't
    * leak the allocator; initialization failures (missing file, schema
    * mismatch) close whatever was already opened before rethrowing.
    */
  private def shardInternalIterator(path: String, schema: StructType,
      conf: org.apache.hadoop.conf.Configuration)
      : Iterator[org.apache.spark.sql.catalyst.InternalRow] =
    new Iterator[org.apache.spark.sql.catalyst.InternalRow] {
      private val alloc = new org.apache.arrow.memory.RootAllocator()
      private val in: java.io.InputStream =
        try {
          val p = new org.apache.hadoop.fs.Path(path)
          p.getFileSystem(conf).open(p)
        } catch { case e: Throwable => alloc.close(); throw e }
      private val reader =
        try new org.apache.arrow.vector.ipc.ArrowStreamReader(in, alloc)
        catch { case e: Throwable =>
          try in.close() finally alloc.close()
          throw e
        }
      private val (root, order) =
        try {
          val r = reader.getVectorSchemaRoot
          val names = r.getSchema.getFields.asScala.map(_.getName).toSeq
          val ord = schema.fieldNames.map(n => names.indexOf(n))
          require(ord.forall(_ >= 0),
            s"$path lacks columns ${schema.fieldNames.filterNot(names.contains).mkString(",")}")
          (r, ord)
        } catch { case e: Throwable =>
          try reader.close() finally { try in.close() finally alloc.close() }
          throw e
        }
      // type dispatch happens ONCE, here, not per value: the projection
      // compiles column accessors for the whole schema
      private val proj = org.apache.spark.sql.catalyst.expressions
        .UnsafeProjection.create(schema.fields.map(_.dataType))
      private var batch: Iterator[org.apache.spark.sql.catalyst.InternalRow] =
        Iterator.empty
      private var closed = false
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => close()))

      private def close(): Unit = if (!closed) {
        closed = true
        try reader.close() finally { try in.close() finally alloc.close() }
      }

      override def hasNext: Boolean = {
        if (closed) return false
        while (!batch.hasNext) {
          if (reader.loadNextBatch()) {
            // zero-copy view over the freshly-loaded Arrow buffers, in
            // the requested (possibly pruned / reordered) column order
            val vecs = root.getFieldVectors
            val cols = order.map(i =>
              new org.apache.spark.sql.vectorized.ArrowColumnVector(vecs.get(i))
                : org.apache.spark.sql.vectorized.ColumnVector).toArray
            batch = new org.apache.spark.sql.vectorized
              .ColumnarBatch(cols, root.getRowCount).rowIterator().asScala
          } else { close(); return false }
        }
        true
      }

      override def next(): org.apache.spark.sql.catalyst.InternalRow = {
        if (!hasNext) throw new NoSuchElementException(path)
        // the projection's UnsafeRow buffer is reused — copy() hands
        // downstream operators an immutable row (they may buffer it)
        proj(batch.next()).copy()
      }
    }

  /** Dev/test reader: one IPC stream file back into (fieldNames,
    * row-major values). Text → String, arrow lists → Seq — shaped for
    * spec comparison against `df.collect()`, not for scale (the
    * production consumer is an Arrow-native reader).
    */
  def readArrowIpc(path: String): (Seq[String], Seq[Seq[Any]]) = {
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val in = new java.io.FileInputStream(path)
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(in, alloc)
    try {
      val root = reader.getVectorSchemaRoot
      val names = root.getSchema.getFields.asScala.map(_.getName).toSeq
      val out = Seq.newBuilder[Seq[Any]]
      while (reader.loadNextBatch()) {
        val vectors = root.getFieldVectors.asScala.toSeq
        var i = 0
        while (i < root.getRowCount) {
          out += vectors.map(v => fromArrow(v.getObject(i)))
          i += 1
        }
      }
      (names, out.result())
    } finally { reader.close(); in.close(); alloc.close() }
  }

  /** The commit step of the task protocol: move a fully-written temp
    * shard under its final name. On filesystems whose rename refuses
    * an existing destination (HDFS semantics), a loser of a
    * concurrent-attempt race DEFERS: the driver swept prior-run shards
    * before the job, so an existing destination can only be a
    * concurrent attempt of THIS run that already committed the same
    * partition — the loser deletes its temp and keeps the winner.
    *
    * ASSUMPTION (the defer-to-winner rule is only safe because of it):
    * every attempt of a partition writes IDENTICAL content. That holds
    * for Spark shuffle/scan determinism as long as the exported plan
    * is deterministic — true for every caller here (exports run on
    * sorted/keyed frames). A caller exporting a nondeterministic frame
    * (e.g. one carrying `rand()`) would keep an arbitrary attempt's
    * bytes — the same contract Spark's own non-transactional file
    * committers have under speculation.
    * Package-private so the race is testable without orchestrating two
    * racing tasks (ArrowExportSpec drives both orders directly).
    */
  private[graft] def commitShard(fs: org.apache.hadoop.fs.FileSystem,
                              tmp: org.apache.hadoop.fs.Path,
                              fin: org.apache.hadoop.fs.Path): Unit = {
    if (!fs.rename(tmp, fin)) {
      fs.delete(tmp, false)
      require(fs.exists(fin),
        s"ArrowExport: rename failed and no committed shard at $fin")
    }
  }

  private def fromArrow(v: Any): Any = v match {
    case t: org.apache.arrow.vector.util.Text => t.toString
    case l: java.util.List[_] => l.asScala.map(fromArrow).toSeq
    case m: java.util.Map[_, _] => // struct column (dev reader only)
      m.asScala.map { case (k, x) => k.toString -> fromArrow(x) }.toMap
    case x => x
  }

  private def structScalar(dt: DataType): Boolean = dt match {
    case BooleanType | IntegerType | LongType | FloatType | DoubleType |
         StringType | BinaryType => true
    case _ => false
  }

  private def checkSupported(name: String, dt: DataType): Unit = dt match {
    case BooleanType | IntegerType | LongType | FloatType | DoubleType |
         StringType | BinaryType | DateType | TimestampType => ()
    case ArrayType(IntegerType | LongType | FloatType | DoubleType |
                   StringType, _) => ()
    // flat structs of scalars — the typed-metadata shape multimodal
    // columns carry (width/height/format next to a binary payload)
    case StructType(fields) if fields.nonEmpty &&
        fields.forall(f => structScalar(f.dataType)) => ()
    // arrays of flat structs — the per-frame / per-segment metadata
    // list shape (e.g. sampled video frames, each with its own typed
    // attributes); one nesting level only, same scalar field set
    case ArrayType(StructType(fields), _) if fields.nonEmpty &&
        fields.forall(f => structScalar(f.dataType)) => ()
    // arrays of arrays of scalars — the packed-batch handoff shape
    // (each bin row carries the per-doc token-id lists it packed);
    // exactly two levels, same element set as single-level arrays
    case ArrayType(ArrayType(IntegerType | LongType | FloatType |
                             DoubleType | StringType, _), _) => ()
    // string-keyed maps with scalar values — the event-properties /
    // tag-bag shape (Arrow map keys are non-nullable by spec; Spark
    // map keys already are)
    case MapType(StringType, vt, _) if structScalar(vt) => ()
    case other => throw new IllegalArgumentException(
      s"ArrowExport: unsupported type $other for column '$name' — " +
        "cast it (or digest to a supported scalar) before export")
  }

  private def arrowField(f: StructField): org.apache.arrow.vector.types.pojo.Field = {
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType}
    import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit}
    def prim(t: ArrowType): Field =
      new Field(f.name, FieldType.nullable(t), java.util.Collections.emptyList())
    f.dataType match {
      case BooleanType => prim(ArrowType.Bool.INSTANCE)
      case IntegerType => prim(new ArrowType.Int(32, true))
      case LongType => prim(new ArrowType.Int(64, true))
      case FloatType => prim(new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE))
      case DoubleType => prim(new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE))
      case StringType => prim(ArrowType.Utf8.INSTANCE)
      case BinaryType => prim(ArrowType.Binary.INSTANCE)
      case DateType => prim(new ArrowType.Date(DateUnit.DAY))
      case TimestampType => prim(new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC"))
      case ArrayType(elem, _) =>
        val child = arrowField(StructField("item", elem))
        new Field(f.name, FieldType.nullable(ArrowType.List.INSTANCE),
          java.util.List.of(child))
      case StructType(fields) =>
        new Field(f.name, FieldType.nullable(ArrowType.Struct.INSTANCE),
          fields.map(arrowField).toList.asJava)
      case MapType(StringType, vt, _) =>
        // Arrow maps are list<entries: struct<key: non-null, value>>;
        // the canonical child names come from MapVector so the writer
        // (UnionMapWriter) and readers agree on the layout
        import org.apache.arrow.vector.complex.MapVector
        val keyF = new Field(MapVector.KEY_NAME,
          new FieldType(false, ArrowType.Utf8.INSTANCE, null),
          java.util.Collections.emptyList())
        val valF = arrowField(StructField(MapVector.VALUE_NAME, vt))
        val entriesF = new Field(MapVector.DATA_VECTOR_NAME,
          new FieldType(false, ArrowType.Struct.INSTANCE, null),
          java.util.List.of(keyF, valF))
        new Field(f.name, FieldType.nullable(new ArrowType.Map(false)),
          java.util.List.of(entriesF))
      case other => throw new IllegalArgumentException(other.toString)
    }
  }

  /** One scalar ELEMENT of an `ArrayData` (or `MapData` value array)
    * into a positional complex writer (list element, nested-list
    * element, or map value — `UnionMapWriter`'s value mode is a
    * `ListWriter` too). Typed `ArrayData` accessors — no boxing
    * (r20: the writer consumes InternalRows). Exhaustive over
    * [[checkSupported]]'s scalar set: an unexpected type THROWS
    * instead of silently leaving a null, so a future
    * checkSupported/dispatch divergence surfaces as an error, never
    * as dropped data.
    */
  private def writeScalarTo(
      w: org.apache.arrow.vector.complex.writer.BaseWriter.ListWriter,
      dt: DataType, a: org.apache.spark.sql.catalyst.util.ArrayData,
      i: Int): Unit =
    if (a.isNullAt(i)) dt match {
      case BooleanType => w.bit().writeNull()
      case IntegerType => w.integer().writeNull()
      case LongType => w.bigInt().writeNull()
      case FloatType => w.float4().writeNull()
      case DoubleType => w.float8().writeNull()
      case StringType => w.varChar().writeNull()
      case BinaryType => w.varBinary().writeNull()
      case other => throw new IllegalStateException(
        s"ArrowExport: no writer dispatch for $other — checkSupported drifted")
    } else dt match {
      case BooleanType =>
        w.bit().writeBit(if (a.getBoolean(i)) 1 else 0)
      case IntegerType => w.integer().writeInt(a.getInt(i))
      case LongType => w.bigInt().writeBigInt(a.getLong(i))
      case FloatType => w.float4().writeFloat4(a.getFloat(i))
      case DoubleType => w.float8().writeFloat8(a.getDouble(i))
      case StringType =>
        w.varChar().writeVarChar(a.getUTF8String(i).toString)
      case BinaryType =>
        w.varBinary().writeVarBinary(a.getBinary(i))
      case other => throw new IllegalStateException(
        s"ArrowExport: no writer dispatch for $other — checkSupported drifted")
    }

  /** One NON-NULL scalar struct field by name (null fields stay unset
    * → null), read from an `InternalRow` struct at ordinal `k`. Same
    * exhaustiveness contract as [[writeScalarTo]].
    */
  private def writeScalarField(
      sw: org.apache.arrow.vector.complex.writer.BaseWriter.StructWriter,
      name: String, dt: DataType,
      e: org.apache.spark.sql.catalyst.InternalRow, k: Int): Unit = dt match {
    case BooleanType =>
      sw.bit(name).writeBit(if (e.getBoolean(k)) 1 else 0)
    case IntegerType => sw.integer(name).writeInt(e.getInt(k))
    case LongType => sw.bigInt(name).writeBigInt(e.getLong(k))
    case FloatType => sw.float4(name).writeFloat4(e.getFloat(k))
    case DoubleType => sw.float8(name).writeFloat8(e.getDouble(k))
    case StringType =>
      sw.varChar(name).writeVarChar(e.getUTF8String(k).toString)
    case BinaryType =>
      sw.varBinary(name).writeVarBinary(e.getBinary(k))
    case other => throw new IllegalStateException(
      s"ArrowExport: no struct-field writer dispatch for $other — " +
        "checkSupported drifted")
  }

  private def writePartition(schema: StructType,
                             rows: Iterator[org.apache.spark.sql.catalyst.InternalRow],
                             out: java.io.OutputStream, batchRows: Int): Unit = {
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.complex.ListVector
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val arrowSchema = new org.apache.arrow.vector.types.pojo.Schema(
      schema.fields.map(arrowField).toList.asJava)
    val root = VectorSchemaRoot.create(arrowSchema, alloc)
    val writer = new org.apache.arrow.vector.ipc.ArrowStreamWriter(root, null, out)
    try {
      writer.start()
      while (rows.hasNext) {
        root.allocateNew()
        val listWriters = root.getFieldVectors.asScala.map {
          case lv: ListVector => lv.getWriter
          case _ => null
        }
        var n = 0
        while (n < batchRows && rows.hasNext) {
          val row = rows.next()
          var j = 0
          while (j < schema.length) {
            if (!row.isNullAt(j)) {
              val vec = root.getVector(j)
              schema(j).dataType match {
                case BooleanType => vec.asInstanceOf[BitVector]
                  .setSafe(n, if (row.getBoolean(j)) 1 else 0)
                case IntegerType => vec.asInstanceOf[IntVector]
                  .setSafe(n, row.getInt(j))
                case LongType => vec.asInstanceOf[BigIntVector]
                  .setSafe(n, row.getLong(j))
                case FloatType => vec.asInstanceOf[Float4Vector]
                  .setSafe(n, row.getFloat(j))
                case DoubleType => vec.asInstanceOf[Float8Vector]
                  .setSafe(n, row.getDouble(j))
                case StringType => vec.asInstanceOf[VarCharVector]
                  .setSafe(n, row.getUTF8String(j).getBytes)
                case BinaryType => vec.asInstanceOf[VarBinaryVector]
                  .setSafe(n, row.getBinary(j))
                // internal DateType IS epoch days; TimestampType IS
                // epoch micros (UTC) — the exact values the external
                // java.sql round trips used to reconstruct
                case DateType => vec.asInstanceOf[DateDayVector]
                  .setSafe(n, row.getInt(j))
                case TimestampType => vec.asInstanceOf[TimeStampMicroTZVector]
                  .setSafe(n, row.getLong(j))
                case ArrayType(st: StructType, _) =>
                  // list-of-flat-struct rides the complex writer: the
                  // writer tracks element offsets and child positions
                  // in one place (direct child setSafe would need a
                  // second running element index per column)
                  val w = listWriters(j)
                  w.setPosition(n)
                  w.startList()
                  val sw = w.struct()
                  val ad = row.getArray(j)
                  var i = 0
                  while (i < ad.numElements()) {
                    if (ad.isNullAt(i)) sw.writeNull()
                    else {
                      val e = ad.getStruct(i, st.length)
                      sw.start()
                      var k = 0
                      while (k < st.length) {
                        if (!e.isNullAt(k))
                          writeScalarField(sw, st(k).name, st(k).dataType, e, k)
                        k += 1
                      }
                      sw.end()
                    }
                    i += 1
                  }
                  w.endList()
                case ArrayType(ArrayType(inner, _), _) =>
                  // packed-batch shape: the outer writer tracks bin
                  // offsets, one inner list writer per packed doc
                  val w = listWriters(j)
                  w.setPosition(n)
                  w.startList()
                  val iw = w.list()
                  val ad = row.getArray(j)
                  var i = 0
                  while (i < ad.numElements()) {
                    if (ad.isNullAt(i)) iw.writeNull()
                    else {
                      val s = ad.getArray(i)
                      iw.startList()
                      var e = 0
                      while (e < s.numElements()) {
                        writeScalarTo(iw, inner, s, e)
                        e += 1
                      }
                      iw.endList()
                    }
                    i += 1
                  }
                  w.endList()
                case MapType(StringType, vt, _) =>
                  // MapVector extends ListVector, so listWriters(j)
                  // already holds ITS writer — the map-mode subclass.
                  // MapData iterates in STORED order (the external-Row
                  // path round-tripped through a scala Map, whose
                  // iteration order for >4 entries was hash order) —
                  // entry ORDER inside a map is semantically free and
                  // every reader accesses by key.
                  val mw = listWriters(j).asInstanceOf[
                    org.apache.arrow.vector.complex.impl.UnionMapWriter]
                  mw.setPosition(n)
                  mw.startMap()
                  val md = row.getMap(j)
                  val keys = md.keyArray(); val vals = md.valueArray()
                  var i = 0
                  while (i < md.numElements()) {
                    mw.startEntry()
                    mw.key().varChar().writeVarChar(keys.getUTF8String(i).toString)
                    writeScalarTo(mw.value(), vt, vals, i)
                    mw.endEntry()
                    i += 1
                  }
                  mw.endMap()
                case ArrayType(elem, _) =>
                  val w = listWriters(j)
                  w.setPosition(n)
                  w.startList()
                  val ad = row.getArray(j)
                  var i = 0
                  while (i < ad.numElements()) {
                    writeScalarTo(w, elem, ad, i)
                    i += 1
                  }
                  w.endList()
                case st: StructType =>
                  // direct child-vector sets (allocateNew covered the
                  // children); an unset inner field stays null
                  val sv = vec.asInstanceOf[
                    org.apache.arrow.vector.complex.StructVector]
                  sv.setIndexDefined(n)
                  val inner = row.getStruct(j, st.length)
                  var k = 0
                  while (k < st.length) {
                    if (!inner.isNullAt(k)) {
                      val cv = sv.getChild(st(k).name)
                      st(k).dataType match {
                        case BooleanType => cv.asInstanceOf[BitVector]
                          .setSafe(n, if (inner.getBoolean(k)) 1 else 0)
                        case IntegerType => cv.asInstanceOf[IntVector]
                          .setSafe(n, inner.getInt(k))
                        case LongType => cv.asInstanceOf[BigIntVector]
                          .setSafe(n, inner.getLong(k))
                        case FloatType => cv.asInstanceOf[Float4Vector]
                          .setSafe(n, inner.getFloat(k))
                        case DoubleType => cv.asInstanceOf[Float8Vector]
                          .setSafe(n, inner.getDouble(k))
                        case StringType => cv.asInstanceOf[VarCharVector]
                          .setSafe(n, inner.getUTF8String(k).getBytes)
                        case BinaryType => cv.asInstanceOf[VarBinaryVector]
                          .setSafe(n, inner.getBinary(k))
                        case other => throw new IllegalStateException(
                          s"ArrowExport: no struct-field vector dispatch " +
                            s"for $other — checkSupported drifted")
                      }
                    }
                    k += 1
                  }
                case other => throw new IllegalStateException(
                  s"ArrowExport: no writer dispatch for $other " +
                    s"(column '${schema(j).name}') — checkSupported drifted")
              }
            }
            j += 1
          }
          n += 1
        }
        root.setRowCount(n)
        writer.writeBatch()
      }
      writer.end()
    } finally { writer.close(); out.close(); root.close(); alloc.close() }
  }
}
