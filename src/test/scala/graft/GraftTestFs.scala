package graft

import java.net.URI
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** A Hadoop FileSystem under a scheme nothing else registers
  * (`graftfs:`), backed by the local disk — exists so ArrowExportSpec
  * can prove the shard I/O dispatches purely on the URI scheme through
  * the Hadoop API: if any byte of the path went through java.io/nio
  * directly, the traffic counters below would stay at zero (or the
  * call would fail to resolve the scheme at all). Instantiated by
  * Hadoop reflection via `fs.graftfs.impl`, so it must stay a
  * top-level class with a no-arg constructor.
  */
class GraftTestFs extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    GraftTestFs.creates.incrementAndGet()
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }

  override def open(f: Path, bufferSize: Int)
      : org.apache.hadoop.fs.FSDataInputStream = {
    GraftTestFs.opens.incrementAndGet()
    super.open(f, bufferSize)
  }

  override def mkdirs(f: Path): Boolean = {
    GraftTestFs.mkdirs.incrementAndGet()
    super.mkdirs(f)
  }
}

object GraftTestFs {
  val creates = new java.util.concurrent.atomic.AtomicLong(0)
  val opens = new java.util.concurrent.atomic.AtomicLong(0)
  val mkdirs = new java.util.concurrent.atomic.AtomicLong(0)
  def reset(): Unit = { creates.set(0); opens.set(0); mkdirs.set(0) }
}
